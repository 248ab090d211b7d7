# -*- coding:utf-8 -*-
"""Per-task heads: multiclass / regression / multilabel (mirrors reference
deeptable_multiclass_test.py, deeptable_regression_test.py,
deeptable_multilabel_test.py)."""

import numpy as np
import pandas as pd
import pytest

from deeptables_tpu.data.datasets import load_boston, load_glass_uci
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.utils import consts


class TestMulticlass:
    def test_fit_predict(self):
        df = load_glass_uci(400)
        y = df.pop(10)
        conf = ModelConfig(nets=['dnn_nets'], metrics=['accuracy'],
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=2, verbose=0)
        assert dt.task == consts.TASK_MULTICLASS
        n_classes = dt.num_classes
        proba = dt.predict_proba(df.head(50))
        assert proba.shape == (50, n_classes)
        np.testing.assert_allclose(np.asarray(proba.sum(1)), 1.0, rtol=1e-4)
        pred = dt.predict(df.head(50))
        assert set(np.unique(pred)) <= set(np.unique(y))
        result = dt.evaluate(df.head(100), y.head(100), verbose=0)
        assert result['accuracy'] >= 0


class TestRegression:
    def test_fit_predict(self):
        df = load_boston()
        y = df.pop('target')
        conf = ModelConfig(nets=['dnn_nets'], metrics=['mse'], task='regression',
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=3, verbose=0)
        assert dt.task == consts.TASK_REGRESSION
        pred = dt.predict(df.head(50))
        assert pred.shape[0] == 50
        result = dt.evaluate(df.head(100), y.head(100), verbose=0)
        assert result['mse'] > 0

    def test_custom_metric_fn(self):
        def r2_c(y_true, y_pred):
            from deeptables_tpu.ops.metrics import r2
            return r2(y_true, y_pred)

        df = load_boston()
        y = df.pop('target')
        conf = ModelConfig(nets=['dnn_nets'], metrics=[r2_c],
                           task='regression', embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=1, verbose=0)
        assert 'val_r2_c' in history.history

    def test_auto_task_inference(self):
        df = load_boston()
        y = df.pop('target')  # float → regression
        dt = DeepTable(ModelConfig(nets=['dnn_nets'], metrics=['rmse']))
        dt.fit(df, y, epochs=1, verbose=0)
        assert dt.task == consts.TASK_REGRESSION


class TestMultilabel:
    def test_fit_predict(self):
        rng = np.random.default_rng(0)
        n, n_labels = 400, 4
        df = pd.DataFrame({
            'c1': rng.choice(list('abcd'), n),
            'c2': rng.choice(list('wxyz'), n),
            'n1': rng.normal(size=n),
            'n2': rng.normal(size=n),
        })
        y = (rng.random((n, n_labels)) > 0.6).astype(np.float32)
        conf = ModelConfig(nets=['dnn_nets'], metrics=['accuracy'],
                           task=consts.TASK_MULTILABEL, embedding_dropout=0)
        dt = DeepTable(config=conf)
        dt.fit(df, y, epochs=1, verbose=0)
        assert dt.task == consts.TASK_MULTILABEL
        proba = dt.predict_proba(df.head(20))
        assert proba.shape == (20, n_labels)
        assert ((proba >= 0) & (proba <= 1)).all()
