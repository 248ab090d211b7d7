# -*- coding:utf-8 -*-
"""Pallas embedding-gradient kernel: per-column one-hot matmul on the MXU.

The backward of a fused multi-column embedding lookup is a scatter-add of
``B * n_cols`` rows.  XLA's TPU scatter costs ~14 ns/row regardless of
collisions (measured v5e), which made it 55% of a DeepFM train step.  For a
column with vocabulary ``V``, the same gradient is a tiny dense matmul:

    dtable_j = one_hot(ids_j, V)^T @ g_j          (2*B*V*D flops)

On the MXU this is essentially free for small/medium ``V`` — and the one-hot
never exists in HBM: each grid step builds the (B, TILE_P) one-hot **in
VMEM** against the step's tile of packed table rows and contracts it with
the lane-expanded updates.

Layout contract (see ``ops.embedding.plan_groups``): the fused table is
lane-packed ``(P, 128)`` with every column's packed region starting at a
multiple of ``TILE_P`` packed rows, so each output tile belongs to exactly
one column and is written exactly once (per batch chunk).

The reference has no analog (its backward is TF's dense segment-sum behind
``tf.nn.embedding_lookup`` — deeptables/models/layers.py:853-904); this
kernel is the TPU-native equivalent of that hot path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 256  # packed rows per output tile; column regions align to this


def _grad_kernel(tile_base_ref, ids_ref, g_ref, out_ref, *, k, dim,
                 n_chunks):
    """One grid step: gradient tile (TILE_P, k*dim) for one column-tile.

    ids_ref: (1, CHUNK, 1) global logical row ids of this step's column.
    g_ref:   (1, CHUNK, dim) incoming gradients for the same column.
    out_ref: (TILE_P, k*dim) tile of the packed-table gradient.
    """
    s = pl.program_id(0)
    c = pl.program_id(1) if n_chunks > 1 else 0
    chunk = ids_ref.shape[1]
    tile_p = out_ref.shape[0]

    ids = ids_ref[0, :, 0]                                # (CHUNK,)
    packed = ids // k
    base = tile_base_ref[s] * tile_p
    # one-hot of packed row within this tile, built in VMEM
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_p), 1)
    onehot = (packed[:, None] == base + cols).astype(jnp.bfloat16)

    # lane-expand updates: g row placed at lane block (id % k) of 128 lanes
    g = g_ref[0].astype(jnp.bfloat16)                     # (CHUNK, dim)
    if k > 1:
        lane_block = jax.lax.broadcasted_iota(
            jnp.int32, (chunk, k * dim), 1) // dim        # (CHUNK, k*dim)
        tiled = jnp.concatenate([g] * k, axis=1)          # (CHUNK, k*dim)
        uexp = jnp.where(lane_block == (ids % k)[:, None], tiled,
                         jnp.bfloat16(0))
    else:
        uexp = g

    tile = jax.lax.dot_general(
        onehot, uexp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (TILE_P, k*dim)

    if n_chunks > 1:
        @pl.when(c == 0)
        def _():
            out_ref[...] = tile

        @pl.when(c > 0)
        def _():
            out_ref[...] = out_ref[...] + tile
    else:
        out_ref[...] = tile


def emb_grad_matmul(ids, g, col_steps, p_out, k, dim,
                    max_chunk=2048, interpret=False):
    """Packed-table gradient for the matmul-handled columns.

    ids (B, n_cols) int32 — global logical row ids (offsets included).
    g   (B, n_cols, dim)  — incoming gradients.
    col_steps — sequence of (col_index, tile_index) pairs, one per grid
        step, tiling each column's TILE_P-aligned packed region.
    p_out — packed rows of the output region (multiple of TILE_P).

    Returns (p_out, k*dim) float32.
    """
    b = ids.shape[0]
    n_steps = len(col_steps)
    chunk = min(b, max_chunk)
    while b % chunk:
        chunk //= 2
    n_chunks = b // chunk

    step_cols = np.array([c for c, _ in col_steps], np.int32)
    tile_base = jnp.asarray(np.array([t for _, t in col_steps], np.int32))

    # per-step operand views (duplicates multi-tile columns' slices; keeps
    # kernel block shapes lane-legal).  Transpose FIRST so the step gather
    # copies contiguous (B, dim) slabs instead of strided columns.
    cols_arr = jnp.asarray(step_cols)
    ids_steps = jnp.take(jnp.transpose(ids), cols_arr, axis=0)[..., None]
    g_steps = jnp.take(jnp.transpose(g, (1, 0, 2)), cols_arr, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, 1),
                         lambda s, c, tiles: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, dim),
                         lambda s, c, tiles: (s, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_P, k * dim),
                               lambda s, c, tiles: (tiles[s], 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_grad_kernel, k=k, dim=dim, n_chunks=n_chunks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_out, k * dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(tile_base, ids_steps.astype(jnp.int32), g_steps)


def emb_grad_oracle(ids, g, p_out, k, dim):
    """Dense-scatter oracle of :func:`emb_grad_matmul` (tests)."""
    b, n_cols = ids.shape
    out = np.zeros((p_out, k * dim), np.float32)
    ids = np.asarray(ids)
    g32 = np.asarray(g, np.float32)
    for j in range(n_cols):
        for i in range(b):
            row = int(ids[i, j])
            p, l = divmod(row, k)
            out[p, l * dim:(l + 1) * dim] += g32[i, j]
    return out
