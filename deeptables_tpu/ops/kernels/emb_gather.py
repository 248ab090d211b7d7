# -*- coding:utf-8 -*-
"""Pallas embedding-gather kernels (experimental; measured and declined).

``gather_pallas``: rows of an HBM-resident table are fetched by id with
double-buffered async DMA — ids arrive via scalar prefetch
(PrefetchScalarGridSpec) so each grid step can compute its DMA source
addresses before the body runs.

``sharded_gather_pallas``: the masked local-shard gather as one fused
kernel — clamp/gather/zero-mask in VMEM — the candidate replacement for
the three-op jnp sequence under shard_map in
parallel/sharded_embedding.py.

**Measured verdict (v5e, B=8192, 26 criteo columns, lane-packed table —
benchmarks/micro_emb.py):** XLA's native gather wins and is the
production path.

- ``jnp.take`` over packed rows: **408 µs**; the masked 3-op local-shard
  sequence (clamp+take+where): **402 µs** — XLA fuses the mask into the
  gather, so the fused kernel has no traffic to remove.
- ``gather_pallas``: **33.4 ms** (77× slower).  One row is a 512 B DMA;
  the scalar core issues/waits descriptors serially, so per-row DMA cost
  (~150 ns) dominates.  XLA's gather uses the vector load path at
  ~2 ns/row.  A DMA-per-row design cannot close that gap at any
  pipeline depth; it only pays off when rows are large (≥ several KB).
- ``sharded_gather_pallas`` does not lower on current Mosaic: a row
  gather ``(N,D) from (V,D)`` hits ``NotImplementedError`` /
  "Shape mismatch" in ``_gather_lowering_rule`` — Mosaic only supports
  ``take_along_axis``-style same-shape ``tpu.dynamic_gather``.  The
  kernel runs in interpret mode only (oracle tests).

Kept as validated building blocks for fusions XLA cannot express
(gather + dequantize, gather + pooling) once Mosaic grows a row-gather
primitive; both are oracle-tested in interpret mode
(tests/test_emb_gather_kernel.py).
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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
