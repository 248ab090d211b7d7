# -*- coding:utf-8 -*-
"""Pallas kernels vs jnp oracles (interpret mode on CPU; the same kernels
compile with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.ops.kernels.fm import fm_pallas

B, F, D = 64, 7, 8


@pytest.fixture(scope='module')
def x():
    return np.random.default_rng(0).normal(size=(B, F, D)).astype(np.float32)


class TestFMKernel:
    def test_forward(self, x):
        out = fm_pallas(jnp.asarray(x), None, True)
        s = x.sum(axis=1)
        expected = 0.5 * (np.square(s) - (x * x).sum(axis=1)) \
            .sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_gradient(self, x):
        def loss_pallas(v):
            return jnp.sum(fm_pallas(v, None, True) ** 2)

        def loss_ref(v):
            sq = jnp.square(jnp.sum(v, axis=1))
            ss = jnp.sum(v * v, axis=1)
            out = 0.5 * jnp.sum(sq - ss, axis=1, keepdims=True)
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss_pallas)(jnp.asarray(x))
        g2 = jax.grad(loss_ref)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)


# (TestCINKernel was removed with the legacy per-layer pallas CIN —
# round-5 housekeeping after two measured declines; the production CIN
# kernels are covered by TestCinBwdKernel/TestCinBwdChunked below)


class TestModuleIntegration:
    def test_fm_module_pallas(self, x):
        from deeptables_tpu.ops import interactions as L_mod
        import deeptables_tpu.ops.kernels.fm as fm_mod
        # route the module through the interpret-mode kernel
        orig = fm_mod.fm_pallas
        module = L_mod.FM(use_pallas=False)
        rng = jax.random.PRNGKey(0)
        v = module.init(rng, jnp.asarray(x))
        ref_out = module.apply(v, jnp.asarray(x))
        pal_out = fm_pallas(jnp.asarray(x), None, True)
        np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                                   rtol=1e-5)


class TestCinBwdKernel:
    """Fused CIN backward (ops/kernels/cin_bwd.py) vs the jnp oracle,
    interpret mode (the TPU lowering is exercised by the benchmarks)."""

    @pytest.mark.parametrize('F,G,L', [(5, 5, 8), (5, 7, 16)])
    def test_matches_oracle(self, F, G, L):
        from deeptables_tpu.ops.kernels.cin_bwd import (cin_bwd_oracle,
                                                        cin_bwd_pallas)
        rng = np.random.default_rng(0)
        db = 256
        x0T = jnp.asarray(rng.normal(size=(F, db)).astype(np.float32))
        hT = jnp.asarray(rng.normal(size=(G, db)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(size=(L, F * G)).astype(np.float32))
        dzT = jnp.asarray(rng.normal(size=(L, db)).astype(np.float32))
        dx0, dh, dw = cin_bwd_pallas(x0T, hT, w2, dzT, interpret=True)
        rx0, rh, rw = cin_bwd_oracle(x0T, hT, w2, dzT)
        np.testing.assert_allclose(np.asarray(dx0), np.asarray(rx0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(rh),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-3)

    def test_grid_accumulation(self):
        """dW must accumulate across >1 grid blocks exactly."""
        from deeptables_tpu.ops.kernels.cin_bwd import (cin_bwd_oracle,
                                                        cin_bwd_pallas)
        rng = np.random.default_rng(1)
        F, G, L, db = 4, 4, 8, 512  # forces >=2 lane blocks at 256-block
        x0T = jnp.asarray(rng.normal(size=(F, db)).astype(np.float32))
        hT = jnp.asarray(rng.normal(size=(G, db)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(size=(L, F * G)).astype(np.float32))
        dzT = jnp.asarray(rng.normal(size=(L, db)).astype(np.float32))
        out = cin_bwd_pallas(x0T, hT, w2, dzT, interpret=True,
                             block_lanes=128)  # 4 grid blocks
        ref = cin_bwd_oracle(x0T, hT, w2, dzT)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3)


class TestVmemBudgetGuards:
    """The kernel dispatch gates must reject configs whose MINIMUM lane
    block exceeds the VMEM budget (advisor round-4 finding: a ~100-field
    config would otherwise dispatch the Pallas path and die at compile
    time instead of taking the partitionable XLA fallback)."""

    def test_cin_bwd_supported_budget(self):
        from deeptables_tpu.ops.kernels.cin_bwd import supported
        # bench shapes fit
        assert supported(26, 26, 128, 16 * 8192, jnp.bfloat16)
        assert supported(26, 64, 128, 16 * 8192, jnp.bfloat16)
        # ~100 fields at cross_layer_size 128: fixed w+dW alone
        # (128*100*104*6 ≈ 8 MB) plus the 128-lane working set blows 13 MB
        assert not supported(100, 100, 128, 16 * 8192, jnp.bfloat16)

    def test_cin_bwd_unsupported_layouts(self):
        from deeptables_tpu.ops.kernels.cin_bwd import supported
        assert not supported(5, 5, 8, 100, jnp.bfloat16)   # db % 128
        assert not supported(5, 5, 7, 256, jnp.bfloat16)   # L % 8
        assert not supported(5, 5, 8, 256, jnp.int32)      # dtype

    def test_cin_contract_falls_back_over_budget(self):
        """'pallas' formulation on an over-budget shape must still
        produce correct gradients (via the XLA 'bm' fallback)."""
        from deeptables_tpu.ops.cin_grad import cin_contract
        rng = np.random.default_rng(3)
        b, f, g, l, d = 8, 10, 10, 8, 4
        x0 = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(b, g, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(l, f, g)).astype(np.float32))

        def loss(form):
            return jax.grad(lambda a: jnp.sum(
                cin_contract(a, h, w, form) ** 2))(x0)

        np.testing.assert_allclose(np.asarray(loss('pallas')),
                                   np.asarray(loss('auto')),
                                   rtol=1e-3, atol=1e-3)

    def test_field_attention_supported_budget(self):
        from deeptables_tpu.ops.kernels.field_attention import supported
        # bench-ish shapes (H=2, F=22, dh=8) fit the 9 MB budget
        assert supported(8, 8192, 2, 22)
        # shape-only call keeps working (no footprint info)
        assert supported(8, 8192)
        assert not supported(4, 8192)            # d_head < 8
        # 256 fields: scores buffer 2*h*f*f*4 per lane * 128 lanes >> 9 MB
        assert not supported(8, 8192, 2, 256)

    def test_attention_block_supported_budget(self):
        from deeptables_tpu.ops.kernels.field_attention import \
            attention_block_supported
        assert attention_block_supported(2, 22, 16, 8192)
        assert not attention_block_supported(2, 256, 16, 8192)


class TestCinBwdChunked:
    """F-chunked backward variant (measured-and-declined opt-in,
    DT_CIN_BWD_CHUNK_F) must match the oracle exactly, including the
    partial last chunk and the G-padding path."""

    @pytest.mark.parametrize('F,G,L,fc', [(26, 64, 128, 8), (26, 26, 16, 8),
                                          (10, 16, 8, 8), (26, 64, 128, 16)])
    def test_matches_oracle(self, F, G, L, fc):
        from deeptables_tpu.ops.kernels.cin_bwd import (cin_bwd_oracle,
                                                        cin_bwd_pallas)
        rng = np.random.default_rng(4)
        db = 256
        x0T = jnp.asarray(rng.normal(size=(F, db)).astype(np.float32))
        hT = jnp.asarray(rng.normal(size=(G, db)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(size=(L, F * G)).astype(np.float32))
        dzT = jnp.asarray(rng.normal(size=(L, db)).astype(np.float32))
        out = cin_bwd_pallas(x0T, hT, w2, dzT, interpret=True,
                             block_lanes=128, chunk_f=fc)
        ref = cin_bwd_oracle(x0T, hT, w2, dzT)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3)

    def test_chunk_plan_alignment(self):
        from deeptables_tpu.ops.kernels.cin_bwd import _chunk_plan
        for F, G in [(26, 64), (26, 32), (100, 104), (20, 16)]:
            plan = _chunk_plan(F, G)
            if plan is None:
                continue
            assert sum(fc for _, fc in plan) == F
            for f0, fc in plan:
                assert f0 % 8 == 0
                assert (f0 * G) % 128 == 0
