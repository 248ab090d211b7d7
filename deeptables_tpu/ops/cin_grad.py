# -*- coding:utf-8 -*-
"""Custom-VJP formulations of the CIN field-pair contraction.

The CIN layer (reference ``deeptables/models/layers.py:589-734``) is, per
layer, the 3-tensor contraction

    z_bld = sum_{f,g} x0_bfd * h_bgd * w_lfg

Round-3 profiling (``benchmarks/profile_xdeepfm.py``, BASELINE.md xDeepFM
roofline bullet) showed the **backward** of XLA's autodiff for this einsum
costs 8.1 ms of the 9.98 ms xDeepFM step: the input-gradient contractions
dx0/dh are emitted as narrow-output batched contractions that cannot engage
the MXU, and the mixed bf16/f32 operands (w is an f32 master param) push
the dots to f32.

This module provides ``cin_contract`` — same math, hand-written backward
with selectable association/orientation so the dominant contractions are
MXU-shaped matmuls and the (B·D, F·G) pair operands are materialized at
most once per direction, in bf16:

- ``auto``   : plain ``jnp.einsum`` + XLA autodiff (round-3 behavior).
- ``assoc``  : BD-major re-association.  dpair = dz @ W as one
               (B·D, L) x (L, F·G) matmul; dx0/dh as broadcast-mul-reduce
               passes over dpair; dW as a (L, B·D) x (B·D, F·G) reduction
               matmul over the recomputed pair.
- ``bm``     : batch-minor orientation.  Same association but every matmul
               is wide-N with (D·B) on the lane axis
               ((F·G, L) x (L, D·B)), and the mul-reduce passes reduce over
               sublane axes with B on lanes — the orientation that fixed
               AutoInt in round 3 (BASELINE.md AutoInt bullet).

All formulations cast the contraction operands to the activation dtype
(bf16 under the default policy) with f32 accumulation
(``preferred_element_type``); dW is returned in f32 (master-param dtype).

The choice is threaded from ``cin_params={'bwd': ...}`` (see
``interactions.CIN``) or the ``DT_CIN_BWD`` env var; the default is the
in-situ measured winner recorded in BASELINE.md.
"""

import functools
import os

import jax
import jax.numpy as jnp

FORMULATIONS = ('auto', 'assoc', 'bm', 'pallas')


def default_formulation() -> str:
    """In-situ measured winner (BASELINE.md xDeepFM table): the fused
    Pallas backward, which itself falls back to 'bm' off-TPU, under a
    >1-device mesh, or at unsupported shapes."""
    return os.environ.get('DT_CIN_BWD', 'pallas')


def _einsum_fwd(x0, h, w):
    """z_bld with f32 accumulation; operands cast to the activation dtype
    (h may arrive f32 from a previous layer's activation — casting it to
    the x0 compute dtype keeps the contraction on the bf16 MXU path)."""
    return jnp.einsum('bfd,bgd,lfg->bld', x0, h.astype(x0.dtype),
                      w.astype(x0.dtype),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cin_contract(x0, h, w, formulation):
    return _einsum_fwd(x0, h, w)


def _fwd(x0, h, w, formulation):
    return _einsum_fwd(x0, h, w), (x0, h, w)


def _bwd_assoc(res, dz):
    """BD-major: one (B·D, L)x(L, F·G) matmul + two reduce passes + dW."""
    x0, h, w = res
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    cd = x0.dtype
    dzm = dz.astype(cd).transpose(0, 2, 1).reshape(B * D, L)
    w2 = w.astype(cd).reshape(L, F * G)
    # dpair_bd,fg = sum_l dz_bd,l w_l,fg   (bf16 store, f32 accumulate)
    dpair = jnp.dot(dzm, w2,
                    preferred_element_type=jnp.float32).astype(cd)
    dpair4 = dpair.reshape(B, D, F, G)
    x0t = x0.transpose(0, 2, 1)                       # (B, D, F)
    ht = h.astype(cd).transpose(0, 2, 1)              # (B, D, G)
    dx0 = (dpair4 * ht[:, :, None, :]).sum(3).transpose(0, 2, 1)
    dh = (dpair4 * x0t[:, :, :, None]).sum(2).transpose(0, 2, 1)
    # dW_l,fg = sum_bd dz_bd,l pair_bd,fg  (pair recomputed, one mul pass)
    pair = (x0t[:, :, :, None] * ht[:, :, None, :]).reshape(B * D, F * G)
    dw = jax.lax.dot_general(dzm, pair, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return (dx0.astype(x0.dtype), dh.astype(h.dtype),
            dw.reshape(w.shape).astype(w.dtype))


def _bwd_bm(res, dz):
    """Batch-minor: wide-N (F·G, L)x(L, D·B) matmuls, B on the lane axis."""
    x0, h, w = res
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    cd = x0.dtype
    dzT = dz.astype(cd).transpose(1, 2, 0).reshape(L, D * B)   # (L, DB)
    x0T = x0.transpose(1, 2, 0).reshape(F, D * B)              # (F, DB)
    hT = h.astype(cd).transpose(1, 2, 0).reshape(G, D * B)     # (G, DB)
    w2 = w.astype(cd).reshape(L, F * G)
    # dpair_fg,db = sum_l w_l,fg dz_l,db — M=F·G, K=L, N=D·B (wide-N)
    dpairT = jax.lax.dot_general(w2, dzT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(cd).reshape(F, G, D * B)
    dx0T = (dpairT * hT[None, :, :]).sum(1)                    # (F, DB)
    dhT = (dpairT * x0T[:, None, :]).sum(0)                    # (G, DB)
    # dW_l,fg = sum_db dz_l,db pair_fg,db  (contract the wide axis)
    pairT = (x0T[:, None, :] * hT[None, :, :]).reshape(F * G, D * B)
    dw = jax.lax.dot_general(dzT, pairT, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx0 = dx0T.reshape(F, D, B).transpose(2, 0, 1)
    dh = dhT.reshape(G, D, B).transpose(2, 0, 1)
    return (dx0.astype(x0.dtype), dh.astype(h.dtype),
            dw.reshape(w.shape).astype(w.dtype))


def _bwd_pallas(res, dz):
    """Fused kernel: the (F·G, D·B) pair operands never leave VMEM
    (ops/kernels/cin_bwd.py); batch-minor transposes at the boundary."""
    x0, h, w = res
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    cd = x0.dtype
    from .kernels.cin_bwd import cin_bwd_pallas, supported
    from .partitioning import mesh_context
    # pallas_call has no GSPMD partitioning rule — any >1-device mesh
    # takes the partitionable XLA 'bm' backward (ops/partitioning.py)
    if not (jax.default_backend() == 'tpu'
            and mesh_context() is None
            and supported(F, G, L, D * B, jnp.dtype(cd))):
        return _bwd_bm(res, dz)
    dzT = dz.astype(cd).transpose(1, 2, 0).reshape(L, D * B)
    x0T = x0.transpose(1, 2, 0).reshape(F, D * B)
    hT = h.astype(cd).transpose(1, 2, 0).reshape(G, D * B)
    w2 = w.astype(cd).reshape(L, F * G)
    dx0T, dhT, dw = cin_bwd_pallas(x0T, hT, w2, dzT)
    dx0 = dx0T.reshape(F, D, B).transpose(2, 0, 1)
    dh = dhT.reshape(G, D, B).transpose(2, 0, 1)
    return (dx0.astype(x0.dtype), dh.astype(h.dtype),
            dw.reshape(w.shape).astype(w.dtype))


def _bwd(formulation, res, dz):
    if formulation == 'assoc':
        return _bwd_assoc(res, dz)
    if formulation == 'pallas':
        return _bwd_pallas(res, dz)
    return _bwd_bm(res, dz)


_cin_contract.defvjp(_fwd, _bwd)


def _bm_kernels_ok(F, G, L, db, dtype):
    """Whether the fused batch-minor kernels may lower here."""
    from .kernels.cin_bwd import supported
    from .partitioning import mesh_context
    return (jax.default_backend() == 'tpu'
            and mesh_context() is None
            and supported(F, G, L, db, jnp.dtype(dtype)))


@jax.custom_vjp
def cin_contract_bm(x0T, hT, w):
    """Batch-minor CIN contraction: ``z_l,(d b) = Σ_fg x0_f,(d b)
    h_g,(d b) w_lfg`` with fused Pallas fwd/bwd kernels on a single TPU
    device (jnp same-math fallback elsewhere).

    x0T: (F, D·B), hT: (G, D·B), w: (L, F, G).  Returns zT (L, D·B) f32.
    Used by the batch-minor CIN tower (``interactions.CIN``), which keeps
    every inter-layer tensor in the (rows, D·B) orientation so no
    per-layer transposes are needed.
    """
    return _bm_fwd_impl(x0T, hT, w)


def _bm_fwd_impl(x0T, hT, w):
    F, db = x0T.shape
    L, _, G = w.shape
    cd = x0T.dtype
    w2 = w.astype(cd).reshape(L, F * G)
    if _bm_kernels_ok(F, G, L, db, cd):
        from .kernels.cin_bwd import cin_fwd_pallas
        return cin_fwd_pallas(x0T, hT.astype(cd), w2)
    pair = (x0T[:, None, :] * hT.astype(cd)[None, :, :]).reshape(F * G, db)
    return jax.lax.dot_general(w2, pair, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bm_fwd(x0T, hT, w):
    return _bm_fwd_impl(x0T, hT, w), (x0T, hT, w)


def _bm_bwd(res, dzT):
    x0T, hT, w = res
    F, db = x0T.shape
    L, _, G = w.shape
    cd = x0T.dtype
    w2 = w.astype(cd).reshape(L, F * G)
    if _bm_kernels_ok(F, G, L, db, cd):
        from .kernels.cin_bwd import cin_bwd_pallas
        dx0T, dhT, dw = cin_bwd_pallas(x0T, hT.astype(cd), w2,
                                       dzT.astype(cd))
    else:
        dzc = dzT.astype(cd)
        dpairT = jax.lax.dot_general(
            w2, dzc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd) \
            .reshape(F, G, db)
        hc = hT.astype(cd)
        dx0T = (dpairT * hc[None, :, :]).sum(1)
        dhT = (dpairT * x0T[:, None, :]).sum(0)
        pairT = (x0T[:, None, :] * hc[None, :, :]).reshape(F * G, db)
        dw = jax.lax.dot_general(dzc, pairT, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return (dx0T.astype(x0T.dtype), dhT.astype(hT.dtype),
            dw.reshape(w.shape).astype(w.dtype))


cin_contract_bm.defvjp(_bm_fwd, _bm_bwd)


def cin_contract(x0, h, w, formulation=None):
    """``z_bld = sum_fg x0_bfd h_bgd w_lfg`` with a selectable backward.

    ``formulation`` in {'auto', 'assoc', 'bm', 'pallas'}; None reads
    ``DT_CIN_BWD`` (default 'pallas', the in-situ winner — BASELINE.md
    xDeepFM table; 'pallas' itself falls back to the partitionable XLA
    'bm' backward off-TPU, under a >1-device mesh, or at shapes/VMEM
    footprints ``kernels.cin_bwd.supported`` rejects).
    """
    if formulation is None:
        formulation = default_formulation()
    if formulation not in FORMULATIONS:
        raise ValueError(f'unknown CIN backward formulation {formulation!r}; '
                         f'expected one of {FORMULATIONS}')
    if formulation == 'auto':
        return _einsum_fwd(x0, h, w)
    return _cin_contract(x0, h, w, formulation)
