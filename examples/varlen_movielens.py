# -*- coding:utf-8 -*-
"""Var-len categorical features + regression on movielens-style data
(mirrors the reference's var-len/regression notebooks)."""

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig


def main():
    df = dsutils.load_movielens()
    y = df.pop('rating')
    df = df.drop(columns=['title', 'timestamp'])

    conf = ModelConfig(
        nets=['dnn_nets'], task='regression', metrics=['rmse'],
        # (column, separator, pooling): masked max-pooling over genre tokens
        var_len_categorical_columns=[('genres', '|', 'max')])
    dt = DeepTable(config=conf)
    model, history = dt.fit(df, y, epochs=10, batch_size=256)
    print('val rmse:', history.history['val_rmse'][-1])
    print('pred:', dt.predict(df.head(5)))


if __name__ == '__main__':
    main()
