# -*- coding:utf-8 -*-
"""Pallas embedding-gather kernels vs dense oracles (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.ops.kernels.emb_gather import (gather_pallas,
                                                   sharded_gather_pallas)


class TestGatherPallas:
    def test_matches_take(self):
        rng = np.random.default_rng(0)
        table = rng.normal(size=(64, 8)).astype(np.float32)
        ids = rng.integers(0, 64, 32).astype(np.int32)
        out = gather_pallas(jnp.asarray(table), jnp.asarray(ids),
                            block_n=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)

    def test_odd_block(self):
        rng = np.random.default_rng(1)
        table = rng.normal(size=(16, 4)).astype(np.float32)
        ids = rng.integers(0, 16, 12).astype(np.int32)
        out = gather_pallas(jnp.asarray(table), jnp.asarray(ids),
                            block_n=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


class TestShardedGatherPallas:
    def test_two_shards_sum_to_dense(self):
        rng = np.random.default_rng(2)
        table = rng.normal(size=(32, 4)).astype(np.float32)
        ids = rng.integers(0, 32, 16).astype(np.int32)
        shard0, shard1 = table[:16], table[16:]
        o0 = sharded_gather_pallas(jnp.asarray(shard0), jnp.asarray(ids), 0,
                                   interpret=True)
        o1 = sharded_gather_pallas(jnp.asarray(shard1), jnp.asarray(ids), 16,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(o0) + np.asarray(o1),
                                   table[ids], rtol=1e-6)
