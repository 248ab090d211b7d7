# -*- coding:utf-8 -*-
"""Quickstart: binary classification on bank-marketing (mirrors the
reference's quick-start notebook and README flow, README.md:80-105)."""

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig, deepnets


def main():
    df = dsutils.load_bank()
    y = df.pop('y')

    conf = ModelConfig(
        nets=deepnets.DeepFM,        # ['linear', 'fm_nets', 'dnn_nets']
        metrics=['AUC'],
        auto_discrete=True,
        earlystopping_patience=3,
    )
    dt = DeepTable(config=conf)
    model, history = dt.fit(df, y, epochs=10, batch_size=512)

    print('last val AUC:', history.history['val_auc'][-1])
    proba = dt.predict_proba(df.head(10))
    pred = dt.predict(df.head(10))
    print('proba:', proba[:3])
    print('pred:', pred[:3])

    dt.save('/tmp/dt_quickstart')
    dt2 = DeepTable.load('/tmp/dt_quickstart')
    print('reloaded AUC:', dict(dt2.evaluate(df.head(1000), y.head(1000))))


if __name__ == '__main__':
    main()
