# -*- coding:utf-8 -*-
"""MXU one-hot-matmul embedding-gradient kernel vs dense oracle
(interpret mode on CPU), plus the end-to-end multicol lookup VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeptables_tpu.ops.kernels.emb_grad import (TILE_P, emb_grad_matmul,
                                                 emb_grad_oracle)
from deeptables_tpu.ops.embedding import (SCATTER_MIN_VOCAB, multicol_lookup,
                                          plan_groups, packed_shape)


def _make_case(vocabs, dim, b, seed=0):
    rng = np.random.default_rng(seed)
    k = 128 // dim
    align = k * TILE_P
    offsets, col_steps, p = [], [], 0
    for j, v in enumerate(vocabs):
        offsets.append(p * k)
        tiles = -(-v // align)
        col_steps.extend((j, p // TILE_P + t) for t in range(tiles))
        p += tiles * TILE_P
    ids = np.stack([rng.integers(0, v, b) for v in vocabs], 1).astype(
        np.int32) + np.asarray(offsets, np.int32)
    g = rng.normal(size=(b, len(vocabs), dim)).astype(np.float32)
    return ids, g, col_steps, p, k, offsets


class TestEmbGradKernel:
    @pytest.mark.parametrize('dim,vocabs,b', [
        (16, (7, 300, 2500), 64),
        (4, (11, 9000), 32),
        (32, (5, 1200), 16),
    ])
    def test_matches_oracle(self, dim, vocabs, b):
        ids, g, col_steps, p, k, offsets = _make_case(vocabs, dim, b)
        out = emb_grad_matmul(jnp.asarray(ids), jnp.asarray(g),
                              tuple(col_steps), p, k, dim, interpret=True)
        ref = emb_grad_oracle(ids, g, p, k, dim)
        # kernel multiplies in bf16 (one-hot exact; g rounded)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2,
                                   atol=2e-2)

    def test_batch_chunking_accumulates(self):
        ids, g, col_steps, p, k, offsets = _make_case((50, 600), 16, 128)
        out = emb_grad_matmul(jnp.asarray(ids), jnp.asarray(g),
                              tuple(col_steps), p, k, 16,
                              max_chunk=32, interpret=True)
        ref = emb_grad_oracle(ids, g, p, k, 16)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2,
                                   atol=2e-2)


class TestMulticolLookupVJP:
    def test_fwd_and_scatter_bwd_match_oracle(self):
        # on CPU the backward takes the scatter path; validates the
        # aligned layout bookkeeping end-to-end
        vocabs = [7, 300, 2500]
        dims = [16, 16, 16]
        plan = plan_groups(vocabs, dims)
        dim, cols, offsets, total, aligned = plan[0]
        assert aligned
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(
            size=packed_shape(total, dim)).astype(np.float32))
        svocabs = [vocabs[c] for c in cols]
        ids = np.stack([rng.integers(0, v, 32) for v in svocabs], 1) \
            .astype(np.int32) + np.asarray(offsets, np.int32)
        flat = jnp.asarray(ids.reshape(-1))

        out = multicol_lookup(table, flat, dim, svocabs, offsets)
        dense = np.asarray(table).reshape(-1, dim)
        np.testing.assert_allclose(np.asarray(out),
                                   dense[ids.reshape(-1)], atol=1e-6)

        g = rng.normal(size=(32 * 3, dim)).astype(np.float32)

        def f(t):
            return (multicol_lookup(t, flat, dim, svocabs, offsets)
                    * jnp.asarray(g)).sum()

        dt = jax.grad(f)(table)
        ref = np.zeros_like(dense)
        np.add.at(ref, ids.reshape(-1), g)
        np.testing.assert_allclose(
            np.asarray(dt).reshape(-1, dim), ref, atol=1e-4)
