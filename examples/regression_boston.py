# -*- coding:utf-8 -*-
"""Regression on the Boston-housing-style dataset (mirrors the reference's
regression notebook, deeptables/examples/; task head per deepmodel.py:436-457).
"""

from sklearn.model_selection import train_test_split

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig, deepnets


def main():
    df = dsutils.load_boston()
    y = df.pop('target')
    X_train, X_test, y_train, y_test = train_test_split(
        df, y, test_size=0.2, random_state=42)

    conf = ModelConfig(
        task='regression',
        nets=deepnets.DCN,
        metrics=['RootMeanSquaredError'],
        auto_discrete=False,
        earlystopping_patience=5,
    )
    dt = DeepTable(config=conf)
    model, history = dt.fit(X_train, y_train, epochs=30, batch_size=64)

    score = dt.evaluate(X_test, y_test)
    print('test scores:', dict(score))
    preds = dt.predict(X_test.head(5))
    print('predictions:', preds, 'targets:', list(y_test.head(5)))


if __name__ == '__main__':
    main()
