# -*- coding:utf-8 -*-
"""End-to-end binary-classification path (mirrors reference
tests/models/deeptable_test.py)."""

import numpy as np
import pandas as pd
import pytest
from sklearn.model_selection import train_test_split

from deeptables_tpu.data.datasets import load_adult, load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.models import deeptable as dt_mod


@pytest.fixture(scope='module')
def fitted():
    df = load_bank(1200)
    y = df.pop('y')
    X_train, X_test, y_train, y_test = train_test_split(
        df, y, test_size=0.2, random_state=42)
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       apply_class_weight=True, embedding_dropout=0)
    dt = DeepTable(config=conf)
    model, history = dt.fit(X_train, y_train, epochs=2, batch_size=128,
                            verbose=0)
    return dt, X_train, y_train, X_test, y_test, history


class TestDeepTable:
    def test_evaluate(self, fitted):
        dt, _, _, X_test, y_test, history = fitted
        result = dt.evaluate(X_test, y_test, verbose=0)
        assert result['AUC'] > 0
        assert 'auc' in result  # case-insensitive

    def test_history(self, fitted):
        *_, history = fitted
        assert 'loss' in history.history
        assert 'val_auc' in history.history

    def test_predict_proba(self, fitted):
        dt, _, _, X_test, y_test, _ = fitted
        proba = dt.predict_proba(X_test)
        assert proba.shape == (len(X_test), 2)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
        pred = dt.proba2predict(proba)
        assert set(np.unique(pred)) <= {'yes', 'no'}
        pred_enc = dt.proba2predict(proba, encode_to_label=False)
        assert set(np.unique(pred_enc)) <= {0, 1}

    def test_predict(self, fitted):
        dt, _, _, X_test, _, _ = fitted
        pred = dt.predict(X_test)
        assert len(pred) == len(X_test)

    def test_apply(self, fitted):
        dt, _, _, X_test, _, _ = fitted
        features = dt.apply(X_test.head(64),
                            output_layers=['flatten_embeddings',
                                           'dnn_dense_1', 'dnn_dense_2'])
        assert isinstance(features, list) and len(features) == 3
        assert features[1].shape == (64, 128)
        assert features[2].shape == (64, 64)
        single = dt.apply(X_test.head(32), output_layers=['flatten_embeddings'])
        assert single.ndim == 2 and single.shape[0] == 32

    def test_apply_with_transformer(self, fitted):
        from sklearn.decomposition import PCA
        dt, _, _, X_test, _, _ = fitted
        out = dt.apply(X_test.head(50),
                       output_layers=['flatten_embeddings', 'dnn_dense_1'],
                       transformer=PCA(n_components=3))
        assert len(out) == 2
        assert out[0].shape == (50, 3)

    def test_probe_evaluate(self, fitted):
        from sklearn.metrics import accuracy_score, roc_auc_score
        dt, X_train, y_train, X_test, y_test, _ = fitted
        result = dt_mod.probe_evaluate(dt, X_train, y_train, X_test, y_test,
                                       layers=['flatten_embeddings'],
                                       score_fn={})
        assert result['flatten_embeddings']['accuracy'] > 0
        result = dt_mod.probe_evaluate(
            dt, X_train, y_train, X_test, y_test,
            layers=['flatten_embeddings', 'dnn_dense_1'],
            score_fn={'auc': roc_auc_score, 'accuracy': accuracy_score})
        assert set(result.keys()) == {'flatten_embeddings', 'dnn_dense_1'}
        assert all('auc' in v for v in result.values())

    def test_unseen_category_prediction(self, fitted):
        dt, _, _, X_test, _, _ = fitted
        X_mod = X_test.head(20).copy()
        X_mod.loc[:, 'job'] = 'never-seen-job'
        proba = dt.predict_proba(X_mod)
        assert proba.shape == (20, 2)
        assert np.isfinite(proba).all()

    def test_model_selectors(self, fitted):
        dt, *_ = fitted
        from deeptables_tpu.utils import consts
        m_cur = dt.get_model(consts.MODEL_SELECTOR_CURRENT)
        m_best = dt.get_model(consts.MODEL_SELECTOR_BEST)
        m_all = dt.get_model(consts.MODEL_SELECTOR_ALL)
        assert m_cur is m_best
        assert len(m_all) == 1

    def test_leaderboard(self, fitted):
        dt, *_ = fitted
        board = dt.leaderboard
        assert board.shape[0] == 1


class TestDuplicateColumns:
    def test_duplicate_rejected(self):
        df = pd.DataFrame(np.random.rand(50, 3), columns=['a', 'a', 'b'])
        y = np.random.randint(0, 2, 50)
        dt = DeepTable(ModelConfig(metrics=['AUC']))
        with pytest.raises(ValueError, match='duplicate'):
            dt.fit(df, y, epochs=1, verbose=0)


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        df = load_bank(600)
        y = df.pop('y')
        conf = ModelConfig(nets=['linear', 'dnn_nets'], metrics=['AUC'],
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        dt.fit(df, y, epochs=1, verbose=0)
        proba_before = dt.predict_proba(df.head(100))

        path = str(tmp_path / 'dt_model')
        dt.save(path)
        dt2 = DeepTable.load(path)
        proba_after = dt2.predict_proba(df.head(100))
        np.testing.assert_allclose(proba_before, proba_after, atol=1e-5)


class TestGBMFeatures:
    @pytest.mark.parametrize('ftype', ['embedding', 'dense'])
    def test_gbm_features(self, ftype):
        df = load_adult(800)
        y = df.pop(14)
        conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           apply_gbm_features=True, gbm_feature_type=ftype,
                           gbm_params={'n_estimators': 5},
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        dt.fit(df, y, epochs=1, verbose=0)
        result = dt.evaluate(df.head(200), y.head(200), verbose=0)
        assert result['AUC'] > 0


class TestMultipleMetrics:
    def test_metrics(self):
        df = load_bank(600)
        y = df.pop('y')
        conf = ModelConfig(nets=['dnn_nets'],
                           metrics=['AUC', 'accuracy', 'logloss'],
                           earlystopping_patience=3)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=2, verbose=0)
        for k in ('val_auc', 'val_accuracy', 'val_logloss'):
            assert k in history.history


def test_chunked_dispatch_matches_per_step():
    """train_steps_per_dispatch=N runs the SAME math as per-step dispatch
    (the scan body IS the single train step): loss histories bit-match."""
    from deeptables_tpu.data.datasets import load_bank
    from deeptables_tpu.models import DeepTable, ModelConfig

    def run(n):
        df = load_bank(900)
        y = df.pop('y')
        conf = ModelConfig(nets=['linear', 'dnn_nets'], metrics=['AUC'],
                           earlystopping_patience=0, embedding_dropout=0,
                           train_steps_per_dispatch=n, seed=5)
        dt = DeepTable(config=conf)
        _, h = dt.fit(df, y, epochs=2, batch_size=128, verbose=0)
        return h.history['loss'], h.history['val_auc']

    l1, a1 = run(1)
    l4, a4 = run(4)
    np.testing.assert_allclose(l1, l4, rtol=1e-6)
    np.testing.assert_allclose(a1, a4, rtol=1e-6)


def test_chunked_dispatch_matches_per_step_weighted():
    """Class weights ride the chunked dispatch too (with_w=True stacks
    the per-step weight vectors): loss histories bit-match per-step."""
    from deeptables_tpu.data.datasets import load_bank
    from deeptables_tpu.models import DeepTable, ModelConfig

    def run(n):
        df = load_bank(900)
        y = df.pop('y')
        conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           earlystopping_patience=0, embedding_dropout=0,
                           apply_class_weight=True,
                           train_steps_per_dispatch=n, seed=5)
        dt = DeepTable(config=conf)
        _, h = dt.fit(df, y, epochs=2, batch_size=128, verbose=0)
        return h.history['loss']

    np.testing.assert_allclose(run(1), run(4), rtol=1e-6)


def test_concat_emb_dense_helper():
    """Surface parity with reference deeptable.py:612-625."""
    import jax.numpy as jnp
    from deeptables_tpu.models import DeepTable, ModelConfig
    dt = DeepTable(ModelConfig(nets=['dnn_nets']))
    a = jnp.ones((4, 3))
    b = jnp.zeros((4, 2))
    assert dt.concat_emb_dense(a, b).shape == (4, 5)
    assert dt.concat_emb_dense(a, None).shape == (4, 3)
    assert dt.concat_emb_dense(None, b).shape == (4, 2)
    with pytest.raises(ValueError):
        dt.concat_emb_dense(None, None)


def test_chunked_dispatch_trailing_flush():
    """When steps_per_epoch exceeds what the data provides, the chunked
    path must flush the trailing partial buffer instead of dropping it
    (or crashing on an empty epoch) — review round-5 finding."""
    from deeptables_tpu.data.datasets import load_bank
    from deeptables_tpu.models import DeepTable, ModelConfig
    df = load_bank(500)
    y = df.pop('y')
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       embedding_dropout=0, train_steps_per_dispatch=8,
                       earlystopping_patience=0, seed=3)
    dt = DeepTable(config=conf)
    # 500 rows / batch 128 -> 3 full batches, fewer than chunk_n=8 and
    # fewer than the requested 10 steps
    _, h = dt.fit(df, y, epochs=1, batch_size=128, steps_per_epoch=10,
                  verbose=0)
    assert np.isfinite(h.history['loss'][0])
