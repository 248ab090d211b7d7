# -*- coding:utf-8 -*-
"""Fused CIN layer kernel (xDeepFM compressed interaction).

One CIN layer computes ``z_bld = Σ_{f,g} x0_bfd · h_bgd · W_lfg``
(the math of reference layers.py:690-705, which loops D ``tf.split`` +
conv1d calls).  A naive einsum materializes a huge interaction intermediate
in HBM; this kernel factors the contraction per embedding dim d as

    M_d  = h_d @ W2            # (TB, G) × (G, F·L) → (TB, F·L) on the MXU
    z_d  = Σ_f x0_d[:, f] ⊙ M_d[:, f, :]          # VPU reduce over fields

with ``W2[g, f·L+l] = W_lfg`` precomputed outside.  The grid is
``(batch_tiles, D)`` so each program handles one embedding dim of one batch
tile — VMEM holds a single M_d and Mosaic double-buffers the tiles.  The
only in-kernel reshape splits the minor axis in units of L, which stays
lane-aligned when L is a multiple of 128 (use :func:`supported` to gate; any
shape works in interpret mode / the jnp fallback).

The custom VJP mirrors the structure; dW2 accumulates across grid steps in
a revisited output block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 512
LANE = 128


def _block_b(batch, requested=None):
    tb = requested or DEFAULT_BLOCK_B
    while batch % tb != 0:
        tb //= 2
        if tb <= 1:
            return 1
    return tb


def supported(L, interpret=False):
    """Whether the Mosaic lowering constraints hold for this layer size."""
    return interpret or L % LANE == 0


def _cin_fwd_kernel(x0_ref, h_ref, w2_ref, o_ref):
    # blocks: x0 (1, TB, F), h (1, TB, G), w2 (G, F*L), o (1, TB, L)
    F = x0_ref.shape[2]
    L = o_ref.shape[2]
    x0_d = x0_ref[0]  # (TB, F)
    h_d = h_ref[0]  # (TB, G)
    m = jnp.dot(h_d, w2_ref[...], preferred_element_type=jnp.float32)
    m3 = m.reshape(-1, F, L)
    # cast BEFORE inserting the minor dim: Mosaic only supports non-no-op
    # minor-dim insertion on 32-bit vectors (bf16 inputs crash otherwise)
    z = jnp.sum(x0_d.astype(jnp.float32)[:, :, None] * m3, axis=1)
    o_ref[0] = z.astype(o_ref.dtype)


def _cin_bwd_kernel(x0_ref, h_ref, w2_ref, g_ref,
                    dx0_ref, dh_ref, dw2_ref):
    F = x0_ref.shape[2]
    L = g_ref.shape[2]
    w2 = w2_ref[...]

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    x0_d = x0_ref[0].astype(jnp.float32)  # (TB, F)
    h_d = h_ref[0].astype(jnp.float32)  # (TB, G)
    g_d = g_ref[0].astype(jnp.float32)  # (TB, L)
    m = jnp.dot(h_d, w2, preferred_element_type=jnp.float32)
    m3 = m.reshape(-1, F, L)
    # dx0_d[b,f] = Σ_l m3[b,f,l] g_d[b,l]
    dx0_ref[0] = jnp.sum(m3 * g_d[:, None, :], axis=2) \
        .astype(dx0_ref.dtype)
    # dm3[b,f,l] = x0_d[b,f] g_d[b,l]
    dm = (x0_d[:, :, None] * g_d[:, None, :]).reshape(-1, F * L)
    dh_ref[0] = jnp.dot(dm, w2.T,
                        preferred_element_type=jnp.float32) \
        .astype(dh_ref.dtype)
    dw2_ref[...] += jnp.dot(h_d.T, dm,
                            preferred_element_type=jnp.float32) \
        .astype(dw2_ref.dtype)


def _w_to_w2(w):
    # (L, F, G) → (G, F*L): W2[g, f*L+l] = W[l, f, g]
    L, F, G = w.shape
    return w.transpose(2, 1, 0).reshape(G, F * L)


def _w2_to_w(w2, L, F, G):
    return w2.reshape(G, F, L).transpose(2, 1, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cin_layer_pallas(x0, h, w, block_b=None, interpret=False):
    """x0 (B, F, D), h (B, G, D), w (L, F, G) → z (B, L, D)."""
    return _cin_fwd(x0, h, w, block_b, interpret)[0]


def _cin_fwd(x0, h, w, block_b=None, interpret=False):
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    tb = _block_b(B, block_b)
    x0_t = x0.transpose(2, 0, 1)  # (D, B, F)
    h_t = h.transpose(2, 0, 1)  # (D, B, G)
    w2 = _w_to_w2(w)  # (G, F*L)
    spec = pl.ANY if interpret else pltpu.VMEM
    z_dbl = pl.pallas_call(
        _cin_fwd_kernel,
        grid=(D, B // tb),
        in_specs=[
            pl.BlockSpec((1, tb, F), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((1, tb, G), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((G, F * L), lambda d, i: (0, 0), memory_space=spec),
        ],
        out_specs=pl.BlockSpec((1, tb, L), lambda d, i: (d, i, 0),
                               memory_space=spec),
        out_shape=jax.ShapeDtypeStruct((D, B, L), x0.dtype),
        interpret=interpret,
    )(x0_t, h_t, w2)
    return z_dbl.transpose(1, 2, 0), (x0, h, w)


def _cin_bwd(block_b, interpret, residuals, g):
    x0, h, w = residuals
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    tb = _block_b(B, block_b)
    x0_t = x0.transpose(2, 0, 1)
    h_t = h.transpose(2, 0, 1)
    w2 = _w_to_w2(w)
    g_t = g.transpose(2, 0, 1)  # (D, B, L)
    spec = pl.ANY if interpret else pltpu.VMEM
    dx0_t, dh_t, dw2 = pl.pallas_call(
        _cin_bwd_kernel,
        grid=(D, B // tb),
        in_specs=[
            pl.BlockSpec((1, tb, F), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((1, tb, G), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((G, F * L), lambda d, i: (0, 0), memory_space=spec),
            pl.BlockSpec((1, tb, L), lambda d, i: (d, i, 0),
                         memory_space=spec),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, F), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((1, tb, G), lambda d, i: (d, i, 0),
                         memory_space=spec),
            pl.BlockSpec((G, F * L), lambda d, i: (0, 0), memory_space=spec),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, B, F), x0.dtype),
            jax.ShapeDtypeStruct((D, B, G), h.dtype),
            jax.ShapeDtypeStruct((G, F * L), w.dtype),
        ],
        interpret=interpret,
    )(x0_t, h_t, w2, g_t.astype(x0.dtype))
    dx0 = dx0_t.transpose(1, 2, 0)
    dh = dh_t.transpose(1, 2, 0)
    dw = _w2_to_w(dw2, L, F, G)
    return dx0, dh, dw


cin_layer_pallas.defvjp(_cin_fwd, _cin_bwd)
