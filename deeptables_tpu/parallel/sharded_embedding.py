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
