# -*- coding:utf-8 -*-
"""Row-sharded embedding tables (the component with no reference equivalent —
SURVEY.md §2.2 "Model/embedding-table parallelism").

Two cooperating pieces:

1. **Placement** (:func:`variable_shardings`): embedding tables larger than a
   threshold are placed with ``NamedSharding(mesh, P(MODEL_AXIS, None))`` —
   rows split across the ``model`` axis.  Everything else is replicated.
   Under ``jit``, XLA's SPMD partitioner then compiles the plain
   ``jnp.take`` gather in the model into: broadcast ids → masked local
   gather → psum over the model axis, and the backward scatter-add stays
   local to each shard.  This is the "annotate shardings, let XLA insert
   collectives" recipe — no hand-written NCCL-style exchange.

2. **Explicit shard_map lookup** (:func:`sharded_lookup`) — a hand-written
   masked-gather + psum used by tests to validate the math XLA should
   produce, and available as a building block for a future Pallas
   all-to-all kernel.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS, MODEL_AXIS


def is_embedding_table(path_tuple, value) -> bool:
    """Heuristic: a 2-D param under an `emb_*` module is an embedding table."""
    if getattr(value, 'ndim', 0) != 2:
        return False
    return any(str(p).startswith('emb_') for p in path_tuple)


def variable_shardings(variables, mesh: Mesh, shard_embeddings: bool = False,
                       shard_threshold_rows: int = 0):
    """A pytree of NamedShardings matching ``variables``.

    Dense params are replicated; embedding tables are row-sharded over the
    model axis when ``shard_embeddings`` and the table has at least
    ``shard_threshold_rows`` rows (and divides the axis size).
    """
    model_size = mesh.shape[MODEL_AXIS]
    replicated = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(MODEL_AXIS, None))

    def spec(path, value):
        if shard_embeddings and model_size > 1 \
                and is_embedding_table(path, value) \
                and value.shape[0] >= max(shard_threshold_rows, model_size) \
                and value.shape[0] % model_size == 0:
            return row_sharded
        return replicated

    return jax.tree_util.tree_map_with_path(
        lambda path, v: spec(tuple(getattr(p, 'key', p) for p in path), v),
        variables)


def place_variables(variables, shardings):
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), variables, shardings)


def _dispatch_plan(flat_ids, n_shards, capacity, rows_per_shard):
    """Sort-by-owner dispatch for an all-to-all exchange (MoE-style).

    Returns (send_ids, order, slot_owner, slot_pos, keep) where
    ``send_ids[s, c]`` is the id the local device asks shard ``s`` for in
    slot ``c`` (or 0 when unused), and the remaining arrays let the caller
    scatter returned rows back to the original id order.  Ids beyond
    ``capacity`` for one owner are dropped (zero rows, zero gradient) —
    the caller picks the capacity/exactness tradeoff.
    """
    n = flat_ids.shape[0]
    owner = jnp.clip(flat_ids // rows_per_shard, 0, n_shards - 1)
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    sorted_ids = flat_ids[order]
    seg_start = jnp.searchsorted(sorted_owner,
                                 jnp.arange(n_shards, dtype=sorted_owner.dtype))
    pos = jnp.arange(n, dtype=jnp.int32) - seg_start[sorted_owner]
    keep = pos < capacity
    # out-of-capacity slots scatter out of bounds → dropped
    slot_pos = jnp.where(keep, pos, capacity)
    send_ids = jnp.zeros((n_shards, capacity), flat_ids.dtype)
    send_ids = send_ids.at[sorted_owner, slot_pos].set(sorted_ids,
                                                       mode='drop')
    return send_ids, order, sorted_owner, slot_pos, keep


def _log_capacity_drops(count):  # host callback from the jitted kernel
    from ..utils import dt_logging
    dt_logging.get_logger(__name__).warning(
        f'sharded_lookup_a2a: {int(count)} ids exceeded the per-shard '
        f'capacity and were dropped (zero rows, zero gradient). Raise '
        f'capacity_factor (None = exact) to avoid silent quality loss.')


def sharded_lookup_a2a(table: jax.Array, ids: jax.Array, mesh: Mesh,
                       capacity_factor: float = None, dim: int = None,
                       use_pallas_gather: bool = False):
    """Row-sharded lookup via explicit all-to-all exchange (DLRM-style).

    The psum formulation (:func:`sharded_lookup`) makes every model shard
    materialize and reduce a full ``(B, F, D)`` tensor, and gather all
    ``B*F`` ids.  Here each model shard instead:

    1. takes a 1/S stripe of the flat id stream,
    2. routes each id to its owning shard with a sort-by-owner dispatch
       (capacity-bounded, like MoE token dispatch),
    3. ``all_to_all`` sends the id requests out, a masked local gather
       answers them, ``all_to_all`` returns the rows,
    4. stripes are re-assembled with ``all_gather`` over the model axis.

    Wire cost per step is ``O(B*F*D / S)`` per link for the row exchange
    plus the unavoidable ``O(B*F*D)`` output all-gather, and each shard
    performs ``B*F/S`` gathers instead of ``B*F`` — the scaling story the
    north star asks for ("row-sharded embedding tables looked up via
    ... all-to-all exchange").  Supports lane-packed tables: pass ``dim``
    (logical row width); rows are sub-selected before the return trip so
    only ``dim`` floats per id ride the wire.

    table: (V_packed, W) row-sharded on MODEL_AXIS; ids: (B, F) logical ids,
    data-sharded.  Returns (B, F, dim) data-sharded, replicated over
    MODEL_AXIS.

    ``capacity_factor=None`` (the default) sizes every shard's request
    buffer for the worst case (all of a stripe's ids owned by one shard) —
    the lookup is **exact** for any id skew.  Passing a number is an
    explicit opt-in to MoE-style capacity bounding: each shard accepts at
    most ``ceil(stripe/n_shards) * capacity_factor`` requests; ids beyond
    that yield zero rows *and zero table gradient*, and a warning with the
    drop count is logged from inside the jitted step whenever drops occur.
    """
    n_model = mesh.shape[MODEL_AXIS]
    w = table.shape[1]
    if dim is None:
        dim = w
    k = w // dim  # logical rows per physical (lane-packed) row
    B, F = ids.shape
    n_data = mesh.shape[DATA_AXIS]
    pad_b = -B % n_data  # remainder batches (e.g. predict tails) pad with
    if pad_b:            # id 0 and the rows are sliced off below
        ids = jnp.concatenate(
            [ids, jnp.zeros((pad_b, F), ids.dtype)], axis=0)
        B += pad_b
    n_local = (B // n_data) * F
    stripe = -(-n_local // n_model)
    if capacity_factor is None:
        capacity = stripe  # exact: worst-case skew fits
    else:
        capacity = int(min(stripe, max(1, -(-stripe // n_model) *
                                       max(1.0, capacity_factor))))
    count_drops = capacity < stripe

    def kernel(local_table, local_ids):
        me = jax.lax.axis_index(MODEL_AXIS)
        rows_local = local_table.shape[0]  # packed rows per shard
        flat = local_ids.reshape(-1)
        pad = stripe * n_model - flat.shape[0]
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        my_ids = jax.lax.dynamic_slice_in_dim(flat, me * stripe, stripe)

        send_ids, order, slot_owner, slot_pos, keep = _dispatch_plan(
            my_ids, n_model, capacity, rows_local * k)
        if count_drops:  # sub-exact capacity opt-in: surface silent drops
            n_dropped = jax.lax.psum(jnp.sum(~keep), MODEL_AXIS)
            is_first = jax.lax.axis_index(MODEL_AXIS) == 0
            jax.lax.cond(
                jnp.logical_and(n_dropped > 0, is_first),
                lambda c: jax.debug.callback(_log_capacity_drops, c),
                lambda c: None, n_dropped)
        # ids out: (S, C) → row s lands on shard s
        recv_ids = jax.lax.all_to_all(send_ids, MODEL_AXIS, split_axis=0,
                                      concat_axis=0, tiled=False)
        # answer requests with a masked local gather
        rel = recv_ids // k - me * rows_local
        valid = (rel >= 0) & (rel < rows_local)
        if use_pallas_gather:
            # the gather_pallas kernel was REMOVED in round 5 after two
            # declines (33.4 ms vs 433 µs fused gather; Mosaic has no
            # row-gather lowering for the sharded variant — BASELINE.md
            # keeps the measurement record); the jnp path below measures
            # at the XLA-gather bound (402 vs 408 µs raw take), so there
            # was no fused traffic left to save anyway.
            from ..utils import dt_logging
            dt_logging.get_logger(__name__).warning(
                'use_pallas_gather is a no-op: the Pallas gather was '
                'removed after two measured declines (BASELINE.md); '
                'using the XLA gather (measured at the gather bound).')
        rows = jnp.take(local_table, jnp.clip(rel, 0, rows_local - 1),
                        axis=0)
        if k > 1:  # sub-select the logical row before the return trip
            sub = jax.nn.one_hot(recv_ids % k, k, dtype=rows.dtype)
            rows = jnp.einsum('sckd,sck->scd',
                              rows.reshape(*recv_ids.shape, k, dim), sub)
        rows = jnp.where(valid[..., None], rows, 0)
        # rows back: slot (s, c) returns to requester s
        back = jax.lax.all_to_all(rows, MODEL_AXIS, split_axis=0,
                                  concat_axis=0, tiled=False)
        # un-permute my stripe
        vals = back[slot_owner, jnp.minimum(slot_pos, capacity - 1)]
        vals = jnp.where(keep[:, None], vals, 0)
        mine = jnp.zeros((stripe, dim), vals.dtype).at[order].set(vals)
        # re-assemble stripes across the model axis
        full = jax.lax.all_gather(mine, MODEL_AXIS, axis=0, tiled=True)
        if pad:
            full = full[:stripe * n_model - pad]
        return full.reshape(local_ids.shape[0], F, dim)

    out = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
        # the final all_gather over MODEL_AXIS makes the output replicated
        # on that axis, but the static varying-mesh-axes checker cannot
        # infer it through the tiled gather
        check_vma=False,
    )(table, ids)
    return out[:B - pad_b] if pad_b else out


def sharded_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh):
    """Explicit row-sharded lookup: masked local gather + psum over the
    model axis, batch sharded over the data axis.

    table: (V, D) row-sharded on MODEL_AXIS; ids: (B, F) data-sharded.
    Returns (B, F, D) data-sharded, replicated over MODEL_AXIS.
    """

    def kernel(local_table, local_ids):
        shard = jax.lax.axis_index(MODEL_AXIS)
        rows = local_table.shape[0]
        offset = shard * rows
        rel = local_ids - offset
        valid = (rel >= 0) & (rel < rows)
        emb = jnp.take(local_table, jnp.clip(rel, 0, rows - 1), axis=0)
        emb = jnp.where(valid[..., None], emb, 0)
        return jax.lax.psum(emb, MODEL_AXIS)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
    )(table, ids)
