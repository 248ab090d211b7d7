# -*- coding:utf-8 -*-
"""Fused CIN layer kernel (xDeepFM compressed interaction).

One CIN layer computes ``z_bld = Σ_{f,g} x0_bfd · h_bgd · W_lfg``
(the math of reference layers.py:690-705, which loops D ``tf.split`` +
conv1d calls).  A plain einsum forces XLA to materialize a
``(B, D, F·G)``-sized intermediate in HBM; this kernel instead forms each
per-dim outer product ``E_d = x0_d ⊗ h_d`` in VMEM and immediately
contracts it with the flattened weight on the MXU — the interaction tensor
never touches HBM.

Layout: inputs are pre-transposed to dim-major ``(B, D, F)`` / ``(B, D, G)``
so per-dim slices are contiguous; the kernel writes ``(B, D, L)`` and the
wrapper transposes back to the module's ``(B, L, D)``.

The custom VJP mirrors the same structure (dE stays in VMEM; dW accumulates
across batch-grid steps in a revisited output block).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256


def _block_b(batch, requested=None):
    tb = requested or DEFAULT_BLOCK_B
    while batch % tb != 0:
        tb //= 2
        if tb <= 1:
            return 1
    return tb


def _cin_fwd_kernel(x0_ref, h_ref, w_ref, o_ref):
    # x0_ref (TB, D, F), h_ref (TB, D, G), w_ref (F*G, L), o_ref (TB, D, L)
    D = x0_ref.shape[1]
    F = x0_ref.shape[2]
    G = h_ref.shape[2]
    w = w_ref[...]
    for d in range(D):
        x0_d = x0_ref[:, d, :]  # (TB, F)
        h_d = h_ref[:, d, :]  # (TB, G)
        e = (x0_d[:, :, None] * h_d[:, None, :]).reshape(-1, F * G)
        o_ref[:, d, :] = jnp.dot(e, w, preferred_element_type=jnp.float32
                                 ).astype(o_ref.dtype)


def _cin_bwd_kernel(x0_ref, h_ref, w_ref, g_ref,
                    dx0_ref, dh_ref, dw_ref):
    # g_ref (TB, D, L); dw_ref (F*G, L) accumulated across grid steps
    D = x0_ref.shape[1]
    F = x0_ref.shape[2]
    G = h_ref.shape[2]
    w = w_ref[...]  # (F*G, L)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for d in range(D):
        x0_d = x0_ref[:, d, :]  # (TB, F)
        h_d = h_ref[:, d, :]  # (TB, G)
        g_d = g_ref[:, d, :]  # (TB, L)
        # dE_d = g_d @ W^T → (TB, F*G)
        de = jnp.dot(g_d, w.T, preferred_element_type=jnp.float32)
        de3 = de.reshape(-1, F, G)
        dx0_ref[:, d, :] = jnp.einsum(
            'bfg,bg->bf', de3, h_d.astype(de3.dtype),
            preferred_element_type=jnp.float32).astype(dx0_ref.dtype)
        dh_ref[:, d, :] = jnp.einsum(
            'bfg,bf->bg', de3, x0_d.astype(de3.dtype),
            preferred_element_type=jnp.float32).astype(dh_ref.dtype)
        e = (x0_d[:, :, None] * h_d[:, None, :]).reshape(-1, F * G)
        dw_ref[...] += jnp.dot(e.T.astype(jnp.float32),
                               g_d.astype(jnp.float32),
                               preferred_element_type=jnp.float32
                               ).astype(dw_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cin_layer_pallas(x0, h, w, block_b=None, interpret=False):
    """x0 (B, F, D), h (B, G, D), w (L, F, G) → z (B, L, D)."""
    return _cin_fwd(x0, h, w, block_b, interpret)[0]


def _cin_fwd(x0, h, w, block_b=None, interpret=False):
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    tb = _block_b(B, block_b)
    x0_t = x0.transpose(0, 2, 1)  # (B, D, F)
    h_t = h.transpose(0, 2, 1)  # (B, D, G)
    wm = w.reshape(L, F * G).T  # (F*G, L)
    spec = pltpu.ANY if interpret else pltpu.VMEM
    z_bdl = pl.pallas_call(
        _cin_fwd_kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, D, F), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((tb, D, G), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((F * G, L), lambda i: (0, 0), memory_space=spec),
        ],
        out_specs=pl.BlockSpec((tb, D, L), lambda i: (i, 0, 0),
                               memory_space=spec),
        out_shape=jax.ShapeDtypeStruct((B, D, L), x0.dtype),
        interpret=interpret,
    )(x0_t, h_t, wm)
    return z_bdl.transpose(0, 2, 1), (x0, h, w)


def _cin_bwd(block_b, interpret, residuals, g):
    x0, h, w = residuals
    B, F, D = x0.shape
    G = h.shape[1]
    L = w.shape[0]
    tb = _block_b(B, block_b)
    x0_t = x0.transpose(0, 2, 1)
    h_t = h.transpose(0, 2, 1)
    wm = w.reshape(L, F * G).T
    g_t = g.transpose(0, 2, 1)  # (B, D, L)
    spec = pltpu.ANY if interpret else pltpu.VMEM
    dx0_t, dh_t, dwm = pl.pallas_call(
        _cin_bwd_kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, D, F), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((tb, D, G), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((F * G, L), lambda i: (0, 0), memory_space=spec),
            pl.BlockSpec((tb, D, L), lambda i: (i, 0, 0), memory_space=spec),
        ],
        out_specs=[
            pl.BlockSpec((tb, D, F), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((tb, D, G), lambda i: (i, 0, 0), memory_space=spec),
            pl.BlockSpec((F * G, L), lambda i: (0, 0), memory_space=spec),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, F), x0.dtype),
            jax.ShapeDtypeStruct((B, D, G), h.dtype),
            jax.ShapeDtypeStruct((F * G, L), w.dtype),
        ],
        interpret=interpret,
    )(x0_t, h_t, wm, g_t.astype(x0.dtype))
    dx0 = dx0_t.transpose(0, 2, 1)
    dh = dh_t.transpose(0, 2, 1)
    dw = dwm.T.reshape(L, F, G)
    return dx0, dh, dw


cin_layer_pallas.defvjp(_cin_fwd, _cin_bwd)
