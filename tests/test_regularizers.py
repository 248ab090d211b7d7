# -*- coding:utf-8 -*-
"""Embedding weight/activity regularizers have an observable effect
(parity: reference layers.py:834-851 applies them inside
MultiColumnEmbedding)."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.ops import regularizers


def test_get_regularizer_math():
    w = np.array([[1.0, -2.0], [3.0, 0.5]], np.float32)
    l1 = regularizers.get_regularizer(('l1', 0.1))
    l2 = regularizers.get_regularizer(('l2', 0.1))
    both = regularizers.get_regularizer({'l1': 0.1, 'l2': 0.2})
    np.testing.assert_allclose(float(l1(w)), 0.1 * 6.5, rtol=1e-6)
    np.testing.assert_allclose(float(l2(w)), 0.1 * 14.25, rtol=1e-6)
    np.testing.assert_allclose(float(both(w)), 0.1 * 6.5 + 0.2 * 14.25,
                               rtol=1e-6)
    assert regularizers.get_regularizer(None) is None
    assert regularizers.get_regularizer('l2') is not None
    with pytest.raises(ValueError):
        regularizers.get_regularizer('weird')
    with pytest.raises(ValueError):
        regularizers.get_regularizer({'l3': 0.1})


def _fit(df, y, **cfg_kw):
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       fixed_embedding_dim=True, embeddings_output_dim=4,
                       earlystopping_patience=0, embedding_dropout=0,
                       **cfg_kw)
    dt = DeepTable(config=conf)
    _, history = dt.fit(df, y, epochs=1, batch_size=128, verbose=0)
    return history.history['loss'][-1]


def test_embedding_regularizers_affect_loss():
    df = load_bank(400)
    y = df.pop('y')
    base = _fit(df.copy(), y)
    with_w = _fit(df.copy(), y, embeddings_regularizer=('l2', 1.0))
    with_a = _fit(df.copy(), y,
                  embeddings_activity_regularizer=('l2', 1.0))
    # the penalty is positive, so the regularized training loss must exceed
    # the unregularized one on the same data/seed
    assert with_w > base
    assert with_a > base


class TestScatterFormulations:
    """All DT_EMB_SCATTER backward formulations must produce identical
    table gradients (round-4 adds 'segsum': sort + one segment-sum write
    per touched row)."""

    @pytest.mark.parametrize('mode', ['logical', 'segsum'])
    def test_matches_lane_default(self, monkeypatch, mode):
        import jax
        import jax.numpy as jnp
        from deeptables_tpu.ops import embedding as E

        rng = np.random.default_rng(hash(mode) % 2**31)
        vocs = (41 + len(mode), 257, 5)  # unique shapes per mode (trace
        # caches key on shapes, so each mode gets a fresh trace)
        ids = np.stack([rng.integers(0, v, 384) for v in vocs],
                       axis=1).astype(np.int32)
        mod = E.MultiColumnEmbedding(input_dims=vocs,
                                     output_dims=(16, 16, 16))
        params = mod.init(jax.random.PRNGKey(0), ids)['params']

        def loss(p):
            o = mod.apply({'params': p}, ids)
            return jnp.sum(o.stacked.astype(jnp.float32) ** 3)

        monkeypatch.setattr(E, '_scatter_mode', lambda: 'lane')
        ref = jax.grad(loss)(params)
        monkeypatch.setattr(E, '_scatter_mode', lambda: mode)
        got = jax.grad(loss)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            ref, got)
