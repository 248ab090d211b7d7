# -*- coding:utf-8 -*-
"""Serving path: compiled bucketed predictor matches the estimator."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.serving import Predictor


@pytest.fixture(scope='module')
def fitted():
    df = load_bank(600)
    y = df.pop('y')
    conf = ModelConfig(nets=['linear', 'dnn_nets'], metrics=['AUC'],
                       embedding_dropout=0)
    dt = DeepTable(config=conf)
    dt.fit(df, y, epochs=1, verbose=0)
    return dt, df


class TestPredictor:
    def test_matches_estimator(self, fitted):
        dt, df = fitted
        pred = Predictor(dt, batch_buckets=(4, 32, 128)).warmup()
        p1 = pred.predict_proba(df.head(50))
        p2 = dt.predict_proba(df.head(50))
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_odd_sizes(self, fitted):
        dt, df = fitted
        pred = Predictor(dt, batch_buckets=(8, 64))
        for n in (1, 7, 9, 65, 200):
            proba = pred.predict_proba(df.head(n))
            assert proba.shape == (n, 2)

    def test_load_roundtrip(self, fitted, tmp_path):
        dt, df = fitted
        path = str(tmp_path / 'served')
        dt.save(path)
        pred = Predictor.load(path, batch_buckets=(16,))
        proba = pred.predict_proba(df.head(10))
        assert proba.shape == (10, 2)

    def test_predict_labels(self, fitted):
        dt, df = fitted
        pred = Predictor(dt, batch_buckets=(32,))
        labels = pred.predict(df.head(20))
        assert set(np.unique(labels)) <= {'yes', 'no'}
