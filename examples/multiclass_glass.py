# -*- coding:utf-8 -*-
"""Multiclass classification (mirrors the reference's multiclass notebook)."""

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig


def main():
    df = dsutils.load_glass_uci()
    y = df.pop(10)

    conf = ModelConfig(nets=['dnn_nets', 'cross_nets'],
                       metrics=['accuracy', 'logloss'])
    dt = DeepTable(config=conf)
    model, history = dt.fit(df, y, epochs=20, batch_size=64)
    print('val accuracy:', history.history['val_accuracy'][-1])
    print('classes:', dt.classes_)
    print('pred:', dt.predict(df.head(5)))


if __name__ == '__main__':
    main()
