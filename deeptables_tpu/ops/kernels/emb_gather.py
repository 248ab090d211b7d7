# -*- coding:utf-8 -*-
"""Pallas embedding-gather kernels.

``gather_pallas``: rows of an HBM-resident table are fetched by id with
double-buffered async DMA — ids arrive via scalar prefetch
(PrefetchScalarGridSpec) so each grid step can compute its DMA source
addresses before the body runs.  This is the building block the north-star
sharded-embedding path composes: on a row-sharded table each shard runs the
same kernel over the ids it owns (mask → local gather) with the psum/
all-to-all return ride on XLA collectives (see
parallel/sharded_embedding.py).

``sharded_gather_pallas``: the masked local-shard gather as one fused
kernel — clamp/gather/zero-mask in VMEM — used under shard_map in place of
the three-op jnp sequence.

XLA's native gather is already heavily tuned on TPU; these kernels are the
foundation for fusions XLA can't express (gather + dequantize, gather +
pooling) and are validated against dense oracles in interpret mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, table_ref, out_ref, scratch, sems):
    """One grid step gathers BLOCK_N rows via pipelined row DMAs."""
    block_n = out_ref.shape[0]
    step = pl.program_id(0)
    base = step * block_n

    def get_dma(slot, j):
        row = ids_ref[base + j]
        return pltpu.make_async_copy(
            table_ref.at[row], scratch.at[slot], sems.at[slot])

    # warm-up: start row 0
    get_dma(0, 0).start()

    def body(j, _):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < block_n)
        def _():
            get_dma(nxt, j + 1).start()

        get_dma(slot, j).wait()
        out_ref[j, :] = scratch[slot]
        return 0

    jax.lax.fori_loop(0, block_n, body, 0)


def gather_pallas(table, ids, block_n=None, interpret=False):
    """table (V, D), ids (N,) int32 → (N, D) via DMA-pipelined row fetch."""
    n = ids.shape[0]
    d = table.shape[1]
    if block_n is None:
        block_n = min(n, 256)
    while n % block_n != 0:
        block_n //= 2
        if block_n <= 1:
            block_n = 1
            break
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block_n, d), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, d), table.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32), table)


def _sharded_gather_kernel(offset_ref, table_ref, ids_ref, out_ref):
    """Masked local gather: rows outside [offset, offset+rows) → 0."""
    rows = table_ref.shape[0]
    offset = offset_ref[0]
    ids = ids_ref[...]
    rel = ids - offset
    valid = (rel >= 0) & (rel < rows)
    emb = jnp.take(table_ref[...], jnp.clip(rel, 0, rows - 1), axis=0)
    out_ref[...] = jnp.where(valid[:, None], emb, 0)


def sharded_gather_pallas(local_table, ids, shard_offset, interpret=False):
    """One shard's contribution to a row-sharded lookup (fused
    clamp+gather+mask); psum across shards completes the lookup.

    local_table (rows, D); ids (N,) global row ids; shard_offset scalar.
    """
    n = ids.shape[0]
    d = local_table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, d), lambda i, off: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _sharded_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), local_table.dtype),
        interpret=interpret,
    )(jnp.asarray([shard_offset], jnp.int32), local_table,
      ids.astype(jnp.int32))
