# -*- coding:utf-8 -*-
"""TPU-native multi-column embedding ops.

The reference keeps **one weight table per categorical column** and performs a
per-column ``embedding_lookup`` in a Python loop
(``deeptables/models/layers.py:853-904``).  On TPU that materializes dozens of
tiny gathers.  Here, columns are grouped by embedding width and each group
shares ONE stacked table of shape ``(sum(vocab_sizes), dim)`` with per-column
row offsets, so the whole group is fetched by a single XLA gather that
pipelines HBM→VMEM traffic efficiently.  When every column has the same width
(the default ``fixed_embedding_dim=True``) there is exactly one fused table
and one gather per batch.

``EmbeddingList`` mimics the reference's "list of per-column (B, 1, d)
tensors" contract (so nets and custom user nets keep working), while exposing
``.stacked`` — the pre-concatenated ``(B, F, D)`` tensor — so built-in nets
skip the redundant concatenation.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .initializers import get_initializer


import functools
import os

_LANES = 128  # TPU lane width: last-dim tiles are always 128 wide


def _ksel_matmul() -> bool:
    """Forward k-select formulation (A/B: benchmarks/profile_emb_ab.py).

    'matmul' (default since round 4): lane-mask + block-eye matmul.
    'elementwise': (M,k,dim) one-hot multiply+reduce.
    History: round 3 measured elementwise faster in-situ (3.22 vs
    3.8 ms DeepFM step) and it became the default; the round-4 re-run
    after the CIN/attention kernel work REVERSED the verdict (matmul
    3.02 ms vs elementwise 3.26) — fusion context shifts these
    decisions, so re-measure per jax upgrade (BASELINE.md
    "Formulation A/B").  Read at trace time; DT_EMB_KSEL overrides.
    """
    return os.environ.get('DT_EMB_KSEL', 'matmul') == 'matmul'


def _scatter_mode() -> str:
    """Backward scatter formulation (A/B: benchmarks/profile_emb_ab.py).

    'lane' (default): lane-expand updates to (M, k*dim) and scatter at
    packed-row granularity — more bytes, but XLA keeps the packed layout.
    'logical': scatter raw (M, dim) rows into a dense (n*k, dim) buffer
    and repack by reshape — 2× faster standalone, but in-situ XLA assigns
    the dim-minor buffer a padded layout and it measures slower.
    'segsum': sort the flat ids and segment-sum the permuted updates at
    logical-row granularity (one write per touched row; the classic
    embedding-backward dedup — round-4 A/B row).
    Read at trace time; set DT_EMB_SCATTER to override.
    """
    return os.environ.get('DT_EMB_SCATTER', 'lane')


def _scatter_logical() -> bool:
    return _scatter_mode() == 'logical'


def _table_param_dtype(default) -> jnp.dtype:
    """bf16 embedding-table storage probe (A/B row, VERDICT r4 item 8).

    ``DT_EMB_TABLE_BF16=1`` stores the packed tables in bfloat16, halving
    the packed-row read bytes of the fused gather (109 MB at the criteo
    bench shapes) and the scatter/update traffic.  MEASUREMENT-ONLY knob:
    without an f32 master copy the Adam update runs at bf16 precision
    (tiny lr·grad increments round to zero), so this must not ship as a
    quality path unless the in-situ win justifies building the
    master-copy optimizer.  Decision recorded in BASELINE.md
    "Formulation A/B"; checked by bench_models.py formulations."""
    if os.environ.get('DT_EMB_TABLE_BF16', '0') == '1':
        return jnp.bfloat16
    return jnp.dtype(default)


def _pack_factor(dim: int) -> int:
    """How many logical rows of width ``dim`` fit one 128-lane row (1 = none).

    A (N, D) table with D < 128 wastes 1 - D/128 of every (8, 128) tile when
    row-major, or (if XLA stores it transposed to avoid the waste) turns each
    row gather/scatter into D strided tile touches.  Packing K = 128/D
    logical rows per physical lane-row makes every gather, scatter-add, and
    optimizer update move full lane-aligned rows with zero storage overhead
    (measured on v5e, DeepFM B=8192: scatter 11.8 ms → 2.9 ms, table Adam
    update 2.0 ms → lane-dense).
    """
    if dim < _LANES and _LANES % dim == 0:
        return _LANES // dim
    return 1


def packed_shape(n_rows: int, dim: int) -> Tuple[int, int]:
    """Physical (rows, width) of the packed table storing (n_rows, dim)."""
    k = _pack_factor(dim)
    return -(-n_rows // k), k * dim


@functools.lru_cache(maxsize=None)
def _make_packed_lookup(n_packed, k, dim, dtype_name):
    dtype = jnp.dtype(dtype_name)

    # fixed (k*dim, dim) block-eye: sums the k lane blocks onto dim lanes
    sel_mat = np.tile(np.eye(dim, dtype=np.float32), (k, 1))

    @jax.custom_vjp
    def lookup(table, flat_ids):
        rows = jnp.take(table, flat_ids // k, axis=0)  # (M, k*dim)
        if k == 1:
            return rows
        if _ksel_matmul():
            # k-select in LANE space: mask the wanted block, sum blocks
            # with one tiny matmul.  Faster standalone (399 vs 433 us)
            # but the dot cannot fuse with consumers; in-situ the
            # elementwise form wins (see benchmarks/profile_emb_ab.py).
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (1, k * dim), 1) // dim
            masked = jnp.where(lane_block == (flat_ids % k)[:, None],
                               rows, 0)
            return masked @ jnp.asarray(sel_mat, table.dtype)
        sel = jax.nn.one_hot(flat_ids % k, k, dtype=table.dtype)
        return (rows.reshape(-1, k, dim) * sel[:, :, None]).sum(axis=1)

    def fwd(table, flat_ids):
        return lookup(table, flat_ids), flat_ids

    def bwd(flat_ids, g):
        g = g.astype(jnp.float32)
        mode = _scatter_mode()
        if mode == 'segsum' and k > 1:
            # sort → segment-sum at logical-row granularity: one write
            # per touched row (the classic embedding-backward dedup)
            order = jnp.argsort(flat_ids)
            dtable = jax.ops.segment_sum(
                g[order], flat_ids[order], num_segments=n_packed * k,
                indices_are_sorted=True)
            return dtable.reshape(n_packed, k * dim).astype(dtype), None
        if k == 1:
            if mode == 'segsum':
                order = jnp.argsort(flat_ids)
                dtable = jax.ops.segment_sum(
                    g[order], flat_ids[order], num_segments=n_packed,
                    indices_are_sorted=True)
                return dtable.astype(dtype), None
            upd, idx, rows_out, repack = g, flat_ids, n_packed, False
        elif _scatter_logical():
            # scatter at LOGICAL-row granularity into a dense (n*k, dim)
            # buffer, then repack with one contiguous reshape
            upd, idx, rows_out, repack = g, flat_ids, n_packed * k, True
        else:
            # lane-expanded packed-row scatter
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (1, k * dim), 1) // dim
            tiled = jnp.concatenate([g] * k, axis=1)
            upd = jnp.where(lane_block == (flat_ids % k)[:, None], tiled, 0)
            idx, rows_out, repack = flat_ids // k, n_packed, False
        dtable = jnp.zeros((rows_out, upd.shape[1]), jnp.float32)
        dtable = dtable.at[idx].add(upd)
        if repack:
            dtable = dtable.reshape(n_packed, k * dim)
        return dtable.astype(dtype), None

    lookup.defvjp(fwd, bwd)
    return lookup


@functools.lru_cache(maxsize=None)
def _make_multicol_lookup(n_packed, k, dim, dtype_name, vocabs, offsets):
    """Lookup over a kernel-aligned fused table (see ``plan_groups``).

    Forward: one fused lane-packed gather.  Backward: on TPU, columns with
    vocabulary ≤ SCATTER_MIN_VOCAB get their gradient from the MXU one-hot
    matmul kernel, the long tail from a lane-packed scatter-add; every
    other platform takes the all-scatter branch (selected at lowering time
    via ``jax.lax.platform_dependent``, so one trace serves both).
    Columns are vocab-ascending so the kernel region is the table prefix.
    """
    from .kernels.emb_grad import TILE_P, emb_grad_matmul

    dtype = jnp.dtype(dtype_name)
    n_cols = len(vocabs)
    n_small = sum(1 for v in vocabs if v <= SCATTER_MIN_VOCAB)

    col_steps = []
    p_small = 0
    for j in range(n_small):
        tiles = -(-vocabs[j] // (k * TILE_P))
        col_steps.extend((j, p_small // TILE_P + t) for t in range(tiles))
        p_small += tiles * TILE_P
    if n_small:
        assert offsets[n_small - 1] // k + \
            -(-vocabs[n_small - 1] // (k * TILE_P)) * TILE_P == p_small

    base_lookup = _make_packed_lookup(n_packed, k, dim, dtype_name)

    @jax.custom_vjp
    def lookup(table, flat_ids):
        return base_lookup(table, flat_ids)

    def fwd(table, flat_ids):
        return lookup(table, flat_ids), flat_ids

    def scatter_grad(ids2, g3, lo_col, row_base, rows_out):
        """Packed-table gradient over columns [lo_col:), rows offset.

        Default ('lane', shared knob ``DT_EMB_SCATTER``): lane-expand the
        (M, dim) updates to (M, k*dim) and scatter at packed-row
        granularity.  The 'logical' alternative (scatter raw rows into a
        dense (rows*k, dim) buffer + contiguous repack reshape) measured
        2× faster STANDALONE at the criteo tail shapes (388 µs vs 788),
        but in-situ the full DeepFM step regressed (see BASELINE.md
        "Formulation A/B": XLA assigns the dim-minor buffer a lane-padded
        layout inside the fused backward), so the standalone win was
        declined and both call sites share the lane default.  Re-measure
        per-site via ``benchmarks/profile_emb_ab.py`` on new hardware.
        """
        idsr = ids2[:, lo_col:].reshape(-1)
        gr = g3[:, lo_col:].reshape(-1, dim)
        mode = _scatter_mode()
        if mode == 'segsum':
            order = jnp.argsort(idsr)
            out = jax.ops.segment_sum(
                gr[order], idsr[order] - (row_base * k if k > 1
                                          else row_base),
                num_segments=rows_out * k if k > 1 else rows_out,
                indices_are_sorted=True)
            return out.reshape(rows_out, k * dim) if k > 1 else out
        if k == 1:
            out = jnp.zeros((rows_out, dim), jnp.float32)
            return out.at[idsr - row_base].add(gr)
        if _scatter_logical():
            out = jnp.zeros((rows_out * k, dim), jnp.float32)
            out = out.at[idsr - row_base * k].add(gr)
            return out.reshape(rows_out, k * dim)
        lane_block = jax.lax.broadcasted_iota(
            jnp.int32, (1, k * dim), 1) // dim
        tiled = jnp.concatenate([gr] * k, axis=1)
        upd = jnp.where(lane_block == (idsr % k)[:, None], tiled, 0)
        out = jnp.zeros((rows_out, k * dim), jnp.float32)
        return out.at[idsr // k - row_base].add(upd)

    def kernel_branch(ids2, g3):
        parts = []
        if n_small:
            parts.append(emb_grad_matmul(
                ids2[:, :n_small], g3[:, :n_small], tuple(col_steps),
                p_small, k, dim))
        if n_small < n_cols:
            parts.append(scatter_grad(ids2, g3, n_small, p_small,
                                      n_packed - p_small))
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=0)

    def scatter_branch(ids2, g3):
        return scatter_grad(ids2, g3, 0, 0, n_packed)

    def bwd(flat_ids, g):
        g = g.astype(jnp.float32)
        ids2 = flat_ids.reshape(-1, n_cols)
        g3 = g.reshape(-1, n_cols, dim)
        if n_small:
            dtable = jax.lax.platform_dependent(
                ids2, g3, tpu=kernel_branch, default=scatter_branch)
        else:
            dtable = scatter_branch(ids2, g3)
        return dtable.astype(dtype), None

    lookup.defvjp(fwd, bwd)
    return lookup


def multicol_lookup(table, flat_ids, dim: int, vocabs, offsets):
    """Fused multi-column gather with the column-structured backward."""
    k = table.shape[1] // dim
    return _make_multicol_lookup(
        table.shape[0], k, dim, table.dtype.name,
        tuple(int(v) for v in vocabs), tuple(int(o) for o in offsets))(
        table, flat_ids)


def packed_lookup(table, flat_ids, dim: int):
    """Gather logical rows of width ``dim`` from a lane-packed table.

    ``table`` has physical shape ``packed_shape(n_rows, dim)``; ``flat_ids``
    index the logical rows.  Hand-written VJP: XLA's autodiff-produced
    scatter for the fused-table gather gets laid out column-major inside the
    full training graph (measured: 49 ms of a 57 ms DeepFM step at B=32k on
    v5e, vs 0.03 ms for the same scatter in isolation); this formulation
    keeps the table row-major and every HBM access a full 128-lane row.
    """
    k = table.shape[1] // dim
    return _make_packed_lookup(table.shape[0], k, dim, table.dtype.name)(
        table, flat_ids)


def pack_table(dense, dim: int):
    """(N, dim) → physical packed layout (host-side helper, e.g. for export)."""
    n = dense.shape[0]
    p, w = packed_shape(n, dim)
    k = w // dim
    pad = p * k - n
    if pad:
        dense = np.pad(np.asarray(dense), ((0, pad), (0, 0)))
    return np.asarray(dense).reshape(p, w)


def unpack_table(packed, n_rows: int, dim: int):
    """Physical packed layout → (n_rows, dim) logical view (host-side)."""
    return np.asarray(packed).reshape(-1, dim)[:n_rows]


def table_lookup(table, flat_ids):
    """Row gather from an UNPACKED (N, D) table with a hand-written backward.

    Kept for callers holding logical-layout tables; new code should store
    tables packed (``packed_shape``) and use :func:`packed_lookup`.
    """
    n_rows, dim = table.shape
    k = _pack_factor(dim)
    if k == 1:
        return _make_packed_lookup(n_rows, 1, dim, table.dtype.name)(
            table, flat_ids)
    p, w = packed_shape(n_rows, dim)
    pad = p * k - n_rows
    tp = jnp.pad(table, ((0, pad), (0, 0))) if pad else table
    return packed_lookup(tp.reshape(p, w), flat_ids, dim)


class EmbeddingList(list):
    """A list of per-column (B, 1, d_i) embeddings with an optional fused view.

    ``stacked`` is the (B, F, D) tensor when all widths agree, else None.
    """

    def __init__(self, items=(), stacked=None):
        super().__init__(items)
        self.stacked = stacked


def concat_embeddings(embeddings) -> Optional[jnp.ndarray]:
    """(B, F, D) from a (possibly fused) embedding list; None when empty.

    Parity: ``deepnets._concat_embeddings`` (reference deepnets.py:30-40) —
    returns None when there are no embeddings so nets can skip themselves.
    """
    if embeddings is None:
        return None
    if isinstance(embeddings, jnp.ndarray):
        return embeddings
    if getattr(embeddings, 'stacked', None) is not None:
        return embeddings.stacked
    if len(embeddings) == 0:
        return None
    if len(embeddings) == 1:
        return embeddings[0]
    return jnp.concatenate(list(embeddings), axis=1)


def flatten_embeddings(embeddings) -> Optional[jnp.ndarray]:
    """(B, sum(d_i)) flat view; works with heterogeneous widths.

    Parity: reference deepmodel.py:269-274 (Flatten over Concatenate(axis=-1)).
    """
    if embeddings is None or len(embeddings) == 0:
        return None
    if getattr(embeddings, 'stacked', None) is not None:
        st = embeddings.stacked
        return st.reshape(st.shape[0], -1)
    flat = [e.reshape(e.shape[0], -1) for e in embeddings]
    return flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=1)


# Columns with vocabulary above this use scatter-add for their gradient;
# smaller columns go through the MXU one-hot matmul kernel (TPU only).
# The kernel's cost scales with the aligned vocabulary (one-hot tiles),
# the scatter's with the update count (~8-14 ns/row measured on v5e);
# they cross over around 8k rows.
SCATTER_MIN_VOCAB = 8192


def plan_groups(input_dims: Sequence[int], output_dims: Sequence[int]):
    """Group column indices by embedding width.

    Returns a list of ``(dim, col_indices, vocab_offsets, total_vocab)``.
    Deterministic given the schema, computed once at trace time.
    ``total_vocab`` is the logical row count including alignment padding;
    the physical table allocates ``packed_shape(total_vocab, dim)``
    (lane-packed).  Within a packed width group, columns are ordered by
    ascending vocabulary and each column's region starts at a multiple of
    ``TILE_P`` packed rows, so the gradient kernel's output tiles map to
    exactly one column (see ops/kernels/emb_grad.py).  Padding rows are
    never addressed and keep zero gradients.
    """
    from .kernels.emb_grad import TILE_P
    groups = {}
    for idx, (voc, dim) in enumerate(zip(input_dims, output_dims)):
        groups.setdefault(int(dim), []).append((idx, int(voc)))
    plan = []
    for dim in sorted(groups):
        cols = groups[dim]
        k = _pack_factor(dim)
        logical = sum(v for _, v in cols)
        align = k * TILE_P
        aligned_total = sum(-(-v // align) * align for _, v in cols)
        # kernel layout only when the alignment padding is cheap; tiny
        # schemas stay compact and take the scatter gradient path instead
        use_aligned = k > 1 and \
            aligned_total <= max(4 * logical, logical + 8 * align)
        if use_aligned:
            # kernel layout: vocab-ascending, TILE_P-aligned regions
            cols = sorted(cols, key=lambda cv: (cv[1], cv[0]))
            offsets, cur = [], 0
            for _, v in cols:
                offsets.append(cur)
                cur += -(-v // align) * align
            col_indices = [c for c, _ in cols]
            plan.append((dim, col_indices,
                         np.asarray(offsets, np.int32), cur, True))
        else:
            col_indices = [c for c, _ in cols]
            vocabs = [v for _, v in cols]
            offsets = np.concatenate(
                [[0], np.cumsum(vocabs)[:-1]]).astype(np.int32)
            plan.append((dim, col_indices, offsets, int(np.sum(vocabs)),
                         False))
    return plan


class MultiColumnEmbedding(nn.Module):
    """Fused per-column embedding over a single (B, n_cat) int tensor.

    Capability parity with the reference's ``MultiColumnEmbedding``
    (layers.py:815-904) — one logical table per column, SpatialDropout1D-style
    embedding dropout — but implemented as width-grouped fused tables with one
    gather per group.
    """

    input_dims: Tuple[int, ...]
    output_dims: Tuple[int, ...]
    dropout_rate: float = 0.
    embeddings_initializer: str = 'uniform'
    param_dtype: str = 'float32'
    # MXU one-hot-matmul gradient kernel (TPU). Disable when the table is
    # row-sharded over a mesh axis: XLA cannot partition a pallas_call, so
    # sharded training must take the scatter gradient instead.
    use_grad_kernel: bool = True
    # Explicit all-to-all row exchange over a (data, model) mesh
    # (embedding_device_strategy='sharded_a2a'): packed tables are padded to
    # a model-axis multiple and looked up via
    # parallel.sharded_embedding.sharded_lookup_a2a instead of relying on
    # XLA's SPMD partitioning of the plain gather.
    a2a_mesh: Any = None
    # None = exact (worst-case skew capacity); a number opts into MoE-style
    # capacity bounding with logged drops — see sharded_lookup_a2a.
    a2a_capacity_factor: Any = None

    @nn.compact
    def __call__(self, ids, training: bool = False):
        if len(self.input_dims) != len(self.output_dims):
            raise ValueError(
                'The length of [input_dims] and [output_dims] must be the same.')
        n_cols = len(self.input_dims)
        if n_cols == 0 or ids.shape[1] == 0:
            return EmbeddingList()
        if ids.shape[1] != n_cols:
            raise ValueError(
                'The inputs dimension on axis 1 must be the same as the '
                'length of [input_dims].')
        # jnp (not numpy) so fancy-indexing with traced constants works
        # when callers jit over raw numpy batches
        ids = jnp.asarray(ids).astype(jnp.int32)
        init = get_initializer(self.embeddings_initializer, default='uniform')

        from ..parallel.mesh import MODEL_AXIS
        use_a2a = (self.a2a_mesh is not None
                   and self.a2a_mesh.shape[MODEL_AXIS] > 1)
        n_model = self.a2a_mesh.shape[MODEL_AXIS] if use_a2a else 1

        plan = plan_groups(self.input_dims, self.output_dims)
        per_col = [None] * n_cols
        uniform_width = len(plan) == 1
        stacked = None
        for dim, col_indices, offsets, total_vocab, aligned in plan:
            # The table is stored lane-packed — physical shape
            # packed_shape(total_vocab, dim) — so gathers, the backward
            # scatter-add, and optimizer updates all move full 128-lane rows.
            p_rows, p_width = packed_shape(total_vocab, dim)
            if use_a2a:  # pad rows so the table row-shards evenly
                p_rows = -(-p_rows // n_model) * n_model
            table = self.param(f'embeddings_d{dim}', init,
                               (p_rows, p_width),
                               _table_param_dtype(self.param_dtype))
            group_ids = ids[:, jnp.asarray(col_indices)] + jnp.asarray(offsets)
            if use_a2a:
                from ..parallel.sharded_embedding import sharded_lookup_a2a
                emb = sharded_lookup_a2a(
                    table, group_ids, self.a2a_mesh,
                    capacity_factor=self.a2a_capacity_factor, dim=dim)
            elif aligned and self.use_grad_kernel:
                vocabs = [self.input_dims[c] for c in col_indices]
                emb = multicol_lookup(table, group_ids.reshape(-1), dim,
                                      vocabs, offsets)
            else:
                emb = packed_lookup(table, group_ids.reshape(-1), dim)
            emb = emb.reshape(
                ids.shape[0], len(col_indices), dim)  # (B, n_group, dim)
            if self.dropout_rate > 0:
                # SpatialDropout1D semantics: drop whole embedding channels
                # per (batch, channel), shared across fields.
                emb = nn.Dropout(self.dropout_rate, broadcast_dims=(1,))(
                    emb, deterministic=not training)
            if uniform_width:
                stacked = emb
            for k, col in enumerate(col_indices):
                per_col[col] = emb[:, k:k + 1, :]
        return EmbeddingList(per_col, stacked=stacked)


class VarLenColumnEmbedding(nn.Module):
    """Embedding for a padded multi-valued categorical column.

    Parity: reference ``VarLenColumnEmbedding`` (layers.py:925-966) which
    reshapes (B, L, D) → (B, 1, L*D).  Here the pooling strategy from the
    var-len column config tuple ``(name, sep, strategy)`` is honored:
    'max'/'avg' perform masked pooling to (B, 1, D) (keeping field widths
    uniform — the TPU-friendly choice), 'flat' reproduces the reference
    reshape.  Token id 0 is the padding id.
    """

    vocabulary_size: int
    output_dim: int
    dropout_rate: float = 0.
    pooling_strategy: str = 'max'
    embeddings_initializer: str = 'uniform'
    param_dtype: str = 'float32'

    @nn.compact
    def __call__(self, ids, training: bool = False):
        ids = ids.astype(jnp.int32)  # (B, L)
        init = get_initializer(self.embeddings_initializer, default='uniform')
        table = self.param('embeddings', init,
                           packed_shape(self.vocabulary_size,
                                        self.output_dim),
                           jnp.dtype(self.param_dtype))
        emb = packed_lookup(table, ids.reshape(-1), self.output_dim).reshape(
            ids.shape[0], ids.shape[1], self.output_dim)  # (B, L, D)
        mask = (ids > 0).astype(emb.dtype)[..., None]  # (B, L, 1)

        if self.pooling_strategy == 'avg':
            denom = jnp.maximum(mask.sum(axis=1), 1.0)  # (B, 1)
            out = (emb * mask).sum(axis=1) / denom  # (B, D)
            out = out[:, None, :]
        elif self.pooling_strategy == 'max':
            neg = jnp.finfo(emb.dtype).min
            masked = jnp.where(mask > 0, emb, neg)
            out = masked.max(axis=1)  # (B, D)
            # rows with no tokens → zeros
            any_tok = (mask.sum(axis=1) > 0)
            out = jnp.where(any_tok, out, 0.0)[:, None, :]
        elif self.pooling_strategy == 'flat':
            out = (emb * mask).reshape(emb.shape[0], 1, -1)  # (B, 1, L*D)
        else:
            raise ValueError(
                f'Unknown var-len pooling strategy: {self.pooling_strategy!r}')

        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, broadcast_dims=(1,))(
                out, deterministic=not training)
        return out
