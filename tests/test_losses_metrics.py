# -*- coding:utf-8 -*-
"""Losses vs numpy oracles; metrics vs sklearn."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.ops import losses as L
from deeptables_tpu.ops import metrics as M


@pytest.fixture(scope='module')
def binary_data():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=64).astype(np.float32)
    y = rng.integers(0, 2, 64).astype(np.float32)
    return logits, y


class TestLosses:
    def test_bce_matches_numpy(self, binary_data):
        logits, y = binary_data
        p = 1 / (1 + np.exp(-logits))
        expected = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
        got = float(L.binary_crossentropy(jnp.asarray(logits),
                                          jnp.asarray(y)))
        assert abs(got - expected) < 1e-5

    def test_bce_sample_weight(self, binary_data):
        logits, y = binary_data
        w = np.zeros(64, np.float32)
        w[:32] = 1.0
        got = float(L.binary_crossentropy(jnp.asarray(logits),
                                          jnp.asarray(y), jnp.asarray(w)))
        expected = float(L.binary_crossentropy(jnp.asarray(logits[:32]),
                                               jnp.asarray(y[:32])))
        assert abs(got - expected) < 1e-5

    def test_cce_int_and_onehot(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(32, 5)).astype(np.float32)
        y_int = rng.integers(0, 5, 32)
        y_oh = np.eye(5)[y_int].astype(np.float32)
        a = float(L.categorical_crossentropy(jnp.asarray(logits),
                                             jnp.asarray(y_int)))
        b = float(L.categorical_crossentropy(jnp.asarray(logits),
                                             jnp.asarray(y_oh)))
        assert abs(a - b) < 1e-5

    def test_focal_reduces_easy_examples(self):
        # large-gamma focal loss should down-weight confident corrects
        logits = jnp.asarray([10.0, -10.0])
        y = jnp.asarray([1.0, 0.0])
        fl = L.binary_focal_loss(gamma=2.0, alpha=0.5)
        bce = float(L.binary_crossentropy(logits, y))
        focal = float(fl(logits, y))
        assert focal < bce + 1e-6

    def test_ghmc_finite(self, binary_data):
        logits, y = binary_data
        loss = L.ghmc_loss(bins=10)(jnp.asarray(logits), jnp.asarray(y))
        assert np.isfinite(float(loss))

    def test_ghmc_stateful_momentum(self, binary_data):
        # reference GHMCLoss keeps an EMA of bin counts in a tf.Variable
        # (layers.py:1146-1150); here the state is threaded explicitly
        logits, y = binary_data
        logits, y = jnp.asarray(logits), jnp.asarray(y)
        ghmc = L.GHMCLoss(bins=10, momentum=0.75)
        assert ghmc.stateful
        s0 = ghmc.init_state()
        l1, s1 = ghmc(logits, y, state=s0)
        l2, s2 = ghmc(logits, y, state=s1)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        # EMA state must move away from zero and keep integrating
        assert float(jnp.abs(s1).sum()) > 0
        assert not np.allclose(np.asarray(s1), np.asarray(s2))
        # occupied bins converge toward the (stationary) batch counts
        batch_counts = np.asarray(s1) / 0.25  # s1 = (1-mmt)*counts from zero
        occupied = batch_counts > 0
        gap1 = np.abs(np.asarray(s1) - batch_counts)[occupied]
        gap2 = np.abs(np.asarray(s2) - batch_counts)[occupied]
        assert (gap2 <= gap1 + 1e-6).all()
        # stateless call (validation path) still returns a bare scalar
        bare = ghmc(logits, y)
        assert np.isfinite(float(bare))

    def test_ghmc_trains_end_to_end(self):
        import pandas as pd
        from deeptables_tpu.models import DeepTable, ModelConfig
        rng = np.random.default_rng(0)
        n = 400
        x = rng.normal(size=(n, 4)).astype(np.float32)
        y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(int)
        df = pd.DataFrame(x, columns=list('abcd'))
        dt = DeepTable(ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                                   loss='ghmc', embedding_dropout=0))
        _, history = dt.fit(df, pd.Series(y), epochs=3, verbose=0)
        assert np.isfinite(history.history['loss'][-1])
        assert history.history['loss'][-1] < history.history['loss'][0]

    def test_auto_loss(self):
        assert L.auto_loss_name('binary', 2) == 'binary_crossentropy'
        assert L.auto_loss_name('regression', 0) == 'mse'
        assert L.auto_loss_name('multiclass', 5) == 'categorical_crossentropy'
        assert L.auto_loss_name('multilabel', 4) == \
            'multilabel_binary_crossentropy'

    def test_mse_huber(self):
        logits = jnp.asarray([1.0, 2.0])
        y = jnp.asarray([0.0, 4.0])
        assert abs(float(L.mse(logits, y)) - 2.5) < 1e-6
        assert float(L.huber(logits, y)) < float(L.mse(logits, y))


class TestMetrics:
    def test_auc_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(2)
        y = rng.integers(0, 2, 500)
        p = np.clip(y * 0.3 + rng.random(500) * 0.7, 0, 1)
        assert abs(M.auc(y, p) - roc_auc_score(y, p)) < 1e-9

    def test_auc_with_ties(self):
        from sklearn.metrics import roc_auc_score
        y = np.array([0, 1, 0, 1, 1, 0])
        p = np.array([0.5, 0.5, 0.2, 0.9, 0.5, 0.1])
        assert abs(M.auc(y, p) - roc_auc_score(y, p)) < 1e-9

    def test_logloss_matches_sklearn(self):
        from sklearn.metrics import log_loss
        rng = np.random.default_rng(3)
        y = rng.integers(0, 2, 200)
        p = np.clip(rng.random(200), 0.01, 0.99)
        assert abs(M.logloss(y, p) - log_loss(y, p)) < 1e-6

    def test_multiclass_metrics(self):
        rng = np.random.default_rng(4)
        y = rng.integers(0, 3, 100)
        proba = rng.dirichlet(np.ones(3), 100)
        acc = M.accuracy(y, proba)
        assert 0 <= acc <= 1
        ll = M.logloss(y, proba)
        assert ll > 0

    def test_r2_and_rmse(self):
        from sklearn.metrics import r2_score
        rng = np.random.default_rng(5)
        y = rng.normal(size=100)
        p = y + rng.normal(scale=0.1, size=100)
        assert abs(M.r2(y, p) - r2_score(y, p)) < 1e-9
        assert abs(M.rmse(y, p) - np.sqrt(np.mean((y - p) ** 2))) < 1e-9

    def test_prf(self):
        from sklearn.metrics import f1_score, precision_score, recall_score
        rng = np.random.default_rng(6)
        y = rng.integers(0, 2, 300)
        proba = rng.random(300)
        pred = (proba > 0.5).astype(int)
        assert abs(M.precision(y, proba) -
                   precision_score(y, pred)) < 1e-9
        assert abs(M.recall(y, proba) - recall_score(y, pred)) < 1e-9
        assert abs(M.f1(y, proba) - f1_score(y, pred)) < 1e-9

    def test_get_metric_case_insensitive(self):
        name, fn = M.get_metric('AUC')
        assert name == 'AUC' and fn is M.auc
        name2, fn2 = M.get_metric('RMSE')
        assert fn2 is M.rmse

    def test_custom_callable(self):
        def my_metric(y_true, y_pred):
            return 0.5
        name, fn = M.get_metric(my_metric)
        assert name == 'my_metric'
        assert fn(None, None) == 0.5

    def test_pr_auc(self):
        from sklearn.metrics import average_precision_score
        rng = np.random.default_rng(7)
        y = rng.integers(0, 2, 400)
        p = np.clip(y * 0.4 + rng.random(400) * 0.6, 0, 1)
        assert abs(M.pr_auc(y, p) - average_precision_score(y, p)) < 1e-6
