# -*- coding:utf-8 -*-
"""Multi-device paths on the virtual 8-device CPU mesh (the analog of the
reference's in-process Dask cluster tests — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.parallel.mesh import (DataAndModelParallel, DataParallel,
                                          build_mesh)
from deeptables_tpu.parallel.sharded_embedding import (sharded_lookup,
                                                       variable_shardings)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


@requires_8
class TestShardedLookup:
    def test_matches_dense_gather(self):
        mesh = build_mesh(data_parallel=4, model_parallel=2)
        rng = np.random.default_rng(0)
        table = rng.normal(size=(64, 8)).astype(np.float32)
        ids = rng.integers(0, 64, (16, 5)).astype(np.int32)
        out = sharded_lookup(jnp.asarray(table), jnp.asarray(ids), mesh)
        expected = table[ids]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_gradient_flows(self):
        mesh = build_mesh(data_parallel=4, model_parallel=2)
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 32, (8, 3)).astype(np.int32))

        def loss(t):
            return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

        g = jax.grad(loss)(table)
        # dense oracle
        def dense_loss(t):
            return jnp.sum(t[ids] ** 2)
        g2 = jax.grad(dense_loss)(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-5)


@requires_8
class TestDataParallelFit:
    def test_fit_on_mesh(self):
        from deeptables_tpu.data.datasets import load_bank
        from deeptables_tpu.models import DeepTable, ModelConfig
        df = load_bank(600)
        y = df.pop('y')
        strategy = DataParallel(num_devices=8)
        conf = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                           metrics=['AUC'], distribute_strategy=strategy,
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=1, batch_size=128, verbose=0)
        assert 'val_auc' in history.history
        proba = dt.predict_proba(df.head(50))
        assert proba.shape == (50, 2)


@requires_8
class TestShardedEmbeddingFit:
    def test_fit_sharded_tables(self):
        from deeptables_tpu.models import DeepTable, ModelConfig
        import pandas as pd
        rng = np.random.default_rng(0)
        n = 512
        df = pd.DataFrame({
            'c1': rng.integers(0, 50, n).astype(str),
            'c2': rng.integers(0, 30, n).astype(str),
            'n1': rng.normal(size=n),
        })
        y = pd.Series(rng.choice(['a', 'b'], n))
        strategy = DataAndModelParallel(data_parallel=4, model_parallel=2)
        conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           distribute_strategy=strategy,
                           embedding_device_strategy='sharded',
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=1, batch_size=64, verbose=0)
        assert 'val_auc' in history.history


@requires_8
def test_variable_shardings_plan():
    mesh = build_mesh(data_parallel=4, model_parallel=2)
    fake = {'params': {
        'emb_categorical_vars_all': {'embeddings_d4': np.zeros((64, 4))},
        'dnn_dense_1': {'kernel': np.zeros((10, 128))},
    }}
    shardings = variable_shardings(fake, mesh, shard_embeddings=True)
    emb_s = shardings['params']['emb_categorical_vars_all']['embeddings_d4']
    dense_s = shardings['params']['dnn_dense_1']['kernel']
    assert 'model' in str(emb_s.spec)
    assert emb_s.spec != dense_s.spec


def test_graft_entry():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 1


@requires_8
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
