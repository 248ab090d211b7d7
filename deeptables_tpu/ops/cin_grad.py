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
    return os.environ.get('DT_CIN_BWD', 'bm')


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
    if not (jax.default_backend() == 'tpu'
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


def cin_contract(x0, h, w, formulation=None):
    """``z_bld = sum_fg x0_bfd h_bgd w_lfg`` with a selectable backward.

    ``formulation`` in {'auto', 'assoc', 'bm'}; None reads ``DT_CIN_BWD``
    (default 'bm', the in-situ winner — BASELINE.md xDeepFM bullet).
    """
    if formulation is None:
        formulation = default_formulation()
    if formulation not in FORMULATIONS:
        raise ValueError(f'unknown CIN backward formulation {formulation!r}; '
                         f'expected one of {FORMULATIONS}')
    if formulation == 'auto':
        return _einsum_fwd(x0, h, w)
    return _cin_contract(x0, h, w, formulation)
