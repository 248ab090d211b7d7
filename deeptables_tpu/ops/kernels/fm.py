# -*- coding:utf-8 -*-
"""Fused FM second-order pooling kernel.

Computes ``out_b = 0.5 * Σ_d [(Σ_f x_bfd)² − Σ_f x_bfd²]``
(the math of reference layers.py:53-62) in a single pass over each batch
tile: one HBM read of x, one small write — no intermediates in HBM.

Includes a custom VJP: ``dx_bfd = g_b · (Σ_f' x_bf'd − x_bfd)``, also a
single fused pass.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 512


def _fm_fwd_kernel(x_ref, o_ref):
    x = x_ref[...]  # (TB, F, D)
    s = jnp.sum(x, axis=1)  # (TB, D)
    sq = jnp.sum(x * x, axis=1)  # (TB, D)
    o_ref[...] = 0.5 * jnp.sum(s * s - sq, axis=1, keepdims=True)


def _fm_bwd_kernel(x_ref, g_ref, dx_ref):
    x = x_ref[...]  # (TB, F, D)
    g = g_ref[...]  # (TB, 1)
    s = jnp.sum(x, axis=1, keepdims=True)  # (TB, 1, D)
    dx_ref[...] = g[:, :, None] * (s - x)


def _block_b(batch, requested=None):
    tb = requested or DEFAULT_BLOCK_B
    while batch % tb != 0:
        tb //= 2
        if tb <= 1:
            return 1
    return tb


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fm_pallas(x, block_b=None, interpret=False):
    """(B, F, D) → (B, 1) FM pooling as a fused Pallas kernel."""
    return _fm_fwd(x, block_b, interpret)[0]


def _fm_fwd(x, block_b=None, interpret=False):
    B, F, D = x.shape
    tb = _block_b(B, block_b)
    out = pl.pallas_call(
        _fm_fwd_kernel,
        grid=(B // tb,),
        in_specs=[pl.BlockSpec((tb, F, D), lambda i: (i, 0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), x.dtype),
        interpret=interpret,
    )(x)
    return out, x


def _fm_bwd(block_b, interpret, residual_x, g):
    x = residual_x
    B, F, D = x.shape
    tb = _block_b(B, block_b)
    spec = pl.ANY if interpret else pltpu.VMEM
    dx = pl.pallas_call(
        _fm_bwd_kernel,
        grid=(B // tb,),
        in_specs=[pl.BlockSpec((tb, F, D), lambda i: (i, 0, 0),
                               memory_space=spec),
                  pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=spec)],
        out_specs=pl.BlockSpec((tb, F, D), lambda i: (i, 0, 0),
                               memory_space=spec),
        out_shape=jax.ShapeDtypeStruct((B, F, D), x.dtype),
        interpret=interpret,
    )(x, g.astype(x.dtype))
    return (dx,)


fm_pallas.defvjp(_fm_fwd, _fm_bwd)
