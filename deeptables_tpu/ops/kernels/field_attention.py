# -*- coding:utf-8 -*-
"""Fused field-axis attention kernel (AutoInt interacting layer).

Computes softmax(q·kᵀ/√dh)·v over the FIELD axis (F ≈ 10–100 fields,
dh ≈ 4–16) for all heads in one pallas_call, with the batch on the LANE
axis: every contraction is a short loop of broadcast-FMAs vectorized over
a block of B lanes, and the (H, F, G, B) score tensor lives only in VMEM.

Why: batch-major XLA lowers the (B·H)-batched (F,dh)×(dh,G) dots as
padded micro-matmuls (<2% MXU tile use; the AutoInt tower measured
14.0 ms of a 17.1 ms step).  The batch-minor XLA rewrite
(ops/interactions.py) fixed the matmul shape problem (tower 4.07 ms) but
still materializes the f32 scores + softmax stages in HBM
(~95 MB/block/pass).  This kernel keeps them in VMEM.

Backward is a custom VJP in the same style (flash-attention-like: saves
only q, k, v and recomputes the softmax inside the backward kernel).

Layouts: q, k, v are (H, F, dh, B) — dh on sublanes, B on lanes — the
same layout `MultiheadAttention._batch_minor` already uses.  Oracle
tests: tests/test_field_attention.py (interpret mode).

Reference semantics: deeptables/models/layers.py:65-153 (scaled softmax
over fields, per-head).

Caveats: used only when dropout_rate == 0 (the weight-dropout variant
stays on the XLA path) and on the TPU backend with a shard-local
B % 128 == 0.  Like every pallas_call it has no GSPMD partitioning rule;
under a >1-device mesh the caller (`MultiheadAttention._batch_minor`)
wraps the whole attention block in a `jax.shard_map` over the data axis
(batch-elementwise math), so the kernel always sees shard-local shapes —
see ops/partitioning.py and
tests/test_parallel.py::TestPallasPartitioningStory.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
MIN_D_HEAD = 8


def supported(d_head: int, batch: int, num_heads=None, n_fields=None) -> bool:
    """Mosaic-lowering constraints (measured on v5e, round 4): the
    flash-style backward crashes the TPU compile helper when the
    sublane-adjacent head dim is below 8 (dh=2 and dh=4 at any batch;
    dh=8 compiles) — e.g. the default config's embeddings_output_dim=4.
    Callers take the XLA batch-minor fallback below this.

    When ``num_heads``/``n_fields`` are given, additionally require that
    the *minimum* 128-lane block fits the kernel's VMEM budget — a very
    wide field count (the scores buffer grows as F²) would otherwise
    dispatch the kernel and fail at compile time instead of taking the
    XLA fallback."""
    ok = d_head >= MIN_D_HEAD and batch % _LANE == 0
    if ok and num_heads is not None and n_fields is not None:
        ok = _LANE * _fa_per_lane(num_heads, n_fields, d_head) \
            <= _FA_BUDGET_BYTES
    return ok


def _slice(x, idx, axis):
    """Static index along `axis` without gather (Mosaic-safe)."""
    return jax.lax.index_in_dim(x, idx, axis=axis, keepdims=False)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    h_, f_, d_, bb = q_ref.shape
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    # scores[h,f,g,:] = Σ_d q[h,f,d,:] k[h,g,d,:]  — loop over dh
    s = jnp.zeros((h_, f_, f_, bb), jnp.float32)
    for d in range(d_):
        q_d = _slice(q, d, 2)                             # (H, F, B)
        k_d = _slice(k, d, 2)                             # (H, G, B)
        s = s + q_d[:, :, None, :] * k_d[:, None, :, :]
    s = s * scale
    # softmax over the G axis
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=2, keepdims=True)
    w = e / z
    # out[h,f,d,:] = Σ_g w[h,f,g,:] v[h,g,d,:]  — loop over G
    o = jnp.zeros((h_, f_, d_, bb), jnp.float32)
    for g in range(f_):
        w_g = _slice(w, g, 2)                             # (H, F, B)
        v_g = _slice(v, g, 1)                             # (H, dh, B)
        o = o + w_g[:, :, None, :] * v_g[:, None, :, :]
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale):
    h_, f_, d_, bb = q_ref.shape
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)

    # recompute the softmax weights (cheaper than saving (H,F,G,B) f32)
    s = jnp.zeros((h_, f_, f_, bb), jnp.float32)
    for d in range(d_):
        s = s + _slice(q, d, 2)[:, :, None, :] * \
            _slice(k, d, 2)[:, None, :, :]
    s = s * scale
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=2, keepdims=True)
    w = e / z                                             # (H, F, G, B)

    # dv[h,g,d,:] = Σ_f w[h,f,g,:] do[h,f,d,:]
    dv = jnp.zeros((h_, f_, d_, bb), jnp.float32)
    for f in range(f_):
        w_f = _slice(w, f, 1)                             # (H, G, B)
        do_f = _slice(do, f, 1)                           # (H, dh, B)
        dv = dv + w_f[:, :, None, :] * do_f[:, None, :, :]
    # dw[h,f,g,:] = Σ_d do[h,f,d,:] v[h,g,d,:]
    dw = jnp.zeros((h_, f_, f_, bb), jnp.float32)
    for d in range(d_):
        dw = dw + _slice(do, d, 2)[:, :, None, :] * \
            _slice(v, d, 2)[:, None, :, :]
    # softmax backward: ds = w * (dw - Σ_g w·dw), then scale
    ds = w * (dw - jnp.sum(w * dw, axis=2, keepdims=True))
    ds = ds * scale
    # dq[h,f,d,:] = Σ_g ds[h,f,g,:] k[h,g,d,:]
    dq = jnp.zeros((h_, f_, d_, bb), jnp.float32)
    for g in range(f_):
        ds_g = _slice(ds, g, 2)                           # (H, F, B)
        k_g = _slice(k, g, 1)                             # (H, dh, B)
        dq = dq + ds_g[:, :, None, :] * k_g[:, None, :, :]
    # dk[h,g,d,:] = Σ_f ds[h,f,g,:] q[h,f,d,:]
    dk = jnp.zeros((h_, f_, d_, bb), jnp.float32)
    for f in range(f_):
        ds_f = _slice(ds, f, 1)                           # (H, G, B)
        q_f = _slice(q, f, 1)                             # (H, dh, B)
        dk = dk + ds_f[:, :, None, :] * q_f[:, None, :, :]

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


_FA_BUDGET_BYTES = 9_000_000


def _fa_per_lane(h, f, d):
    return (3 * h * f * d * 2            # q,k,v bf16
            + 2 * h * f * f * 4          # scores + weights f32
            + 3 * h * f * d * 4)         # out/accumulators f32


def _pick_block(b, h, f, d, budget_bytes=_FA_BUDGET_BYTES):
    """Largest lane block (multiple of 128 dividing b) fitting VMEM."""
    bb = min(b, 1024)
    per_lane = _fa_per_lane(h, f, d)
    while bb > _LANE:
        if bb % _LANE == 0 and b % bb == 0 and bb * per_lane <= budget_bytes:
            break
        bb //= 2
    return max(bb, _LANE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def field_attention(q, k, v, scale, interpret=False):
    """softmax(q·kᵀ·scale)·v over fields; q/k/v/out are (H, F, dh, B)."""
    return _fa_fwd_impl(q, k, v, scale, interpret)


def _fa_fwd_impl(q, k, v, scale, interpret):
    h, f, d, b = q.shape
    bb = _pick_block(b, h, f, d)
    if b % bb:
        raise ValueError(f'batch {b} not a multiple of lane block {bb}')
    spec = pl.BlockSpec((h, f, d, bb), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, f, d, b), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _fa_fwd(q, k, v, scale, interpret):
    return _fa_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _fa_bwd(scale, interpret, res, do):
    q, k, v = res
    h, f, d, b = q.shape
    bb = _pick_block(b, h, f, d)
    spec = pl.BlockSpec((h, f, d, bb), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((h, f, d, b), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b // bb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


field_attention.defvjp(_fa_fwd, _fa_bwd)


def field_attention_oracle(q, k, v, scale):
    """jnp reference implementation (same math, batch-minor layouts)."""
    s = jnp.einsum('hfdb,hgdb->hfgb', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    w = jax.nn.softmax(s, axis=2)
    return jnp.einsum('hfgb,hgdb->hfdb', w,
                      v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused attention BLOCK: QKV+residual projections + relu + scores/softmax/
# context + residual-add + relu in ONE kernel (round 4).
#
# Motivation (benchmarks/profile_autoint.py tower ablations): the four
# per-block projections cost 0.74 ms of the 2.66 ms AutoInt tower — not
# their dots (~1 GFLOP) but the q/k/v/r HBM round-trips and backward
# elementwise passes.  Here they are computed per batch-lane block in VMEM.
#
# Layouts: x is (U, F, B) batch-minor; the projection weights arrive as one
# augmented matrix w_aug (U+1, 4U) = [Wq|Wk|Wv|Wr] stacked over columns
# with the biases as the last row (an in-kernel ones-row provides the
# bias path), so q = relu(w_aug[:,:U]^T @ [x;1]) etc.  BatchNorm stays
# outside (its statistics span the full batch).
# ---------------------------------------------------------------------------


def _block_qkvr(xa, w_aug, U, H, dh, f_, bb):
    """Shared fwd recompute: pre-activations + split heads."""
    pre = jax.lax.dot_general(w_aug, xa, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    post = jnp.maximum(pre, 0.0)                     # (4U, F*Bb) f32
    def head(i):
        t = jax.lax.slice_in_dim(post, i * U, (i + 1) * U, axis=0)
        return t.reshape(H, dh, f_, bb)
    return pre, post, head(0), head(1), head(2), head(3)


def _ab_fwd_kernel(x_ref, w_ref, o_ref, *, scale, H, dh):
    U, f_, bb = x_ref.shape
    x = x_ref[...]
    xa = jnp.concatenate(
        [x.reshape(U, f_ * bb),
         jnp.ones((1, f_ * bb), x.dtype)], axis=0)   # (U+1, F*Bb)
    _, _, q, k, v, r = _block_qkvr(xa, w_ref[...], U, H, dh, f_, bb)

    s = jnp.zeros((H, f_, f_, bb), jnp.float32)
    for d in range(dh):
        q_d = _slice(q, d, 1)                        # (H, F, Bb)
        k_d = _slice(k, d, 1)
        s = s + q_d[:, :, None, :] * k_d[:, None, :, :]
    s = s * scale
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=2, keepdims=True)        # (H, F, G, Bb)

    ctx = jnp.zeros((H, dh, f_, bb), jnp.float32)
    for g in range(f_):
        w_g = _slice(w, g, 2)                        # (H, F, Bb)
        v_g = _slice(v, g, 2)                        # (H, dh, Bb)
        ctx = ctx + w_g[:, None, :, :] * v_g[:, :, None, :]
    out = ctx.reshape(U, f_, bb) + r.reshape(U, f_, bb)
    o_ref[...] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


def _ab_bwd_kernel(x_ref, w_ref, do_ref, dpre_ref, *, scale, H, dh):
    U, f_, bb = x_ref.shape
    x = x_ref[...]
    w_aug = w_ref[...]
    xa = jnp.concatenate(
        [x.reshape(U, f_ * bb),
         jnp.ones((1, f_ * bb), x.dtype)], axis=0)
    pre, post, q, k, v, r = _block_qkvr(xa, w_aug, U, H, dh, f_, bb)

    # recompute scores/softmax/context
    s = jnp.zeros((H, f_, f_, bb), jnp.float32)
    for d in range(dh):
        s = s + _slice(q, d, 1)[:, :, None, :] * \
            _slice(k, d, 1)[:, None, :, :]
    s = s * scale
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    wgt = e / jnp.sum(e, axis=2, keepdims=True)
    ctx = jnp.zeros((H, dh, f_, bb), jnp.float32)
    for g in range(f_):
        ctx = ctx + _slice(wgt, g, 2)[:, None, :, :] * \
            _slice(v, g, 2)[:, :, None, :]

    do = do_ref[...].astype(jnp.float32)             # (U, F, Bb)
    mask = (ctx.reshape(U, f_, bb) + r.reshape(U, f_, bb)) > 0
    dpost_out = jnp.where(mask, do, 0.0)             # (U, F, Bb)
    dctx = dpost_out.reshape(H, dh, f_, bb)
    dr = dpost_out

    # dwgt[h,f,g,:] = sum_d dctx[h,d,f,:] v[h,d,g,:]
    dwgt = jnp.zeros((H, f_, f_, bb), jnp.float32)
    for d in range(dh):
        dwgt = dwgt + _slice(dctx, d, 1)[:, :, None, :] * \
            _slice(v, d, 1)[:, None, :, :]
    ds = wgt * (dwgt - jnp.sum(wgt * dwgt, axis=2, keepdims=True)) * scale

    # dq[h,d,f,:] = sum_g ds[h,f,g,:] k[h,d,g,:]
    dq = jnp.zeros((H, dh, f_, bb), jnp.float32)
    for g in range(f_):
        dq = dq + _slice(ds, g, 2)[:, None, :, :] * \
            _slice(k, g, 2)[:, :, None, :]
    # dk[h,d,g,:] = sum_f ds[h,f,g,:] q[h,d,f,:]
    dk = jnp.zeros((H, dh, f_, bb), jnp.float32)
    dv = jnp.zeros((H, dh, f_, bb), jnp.float32)
    for f in range(f_):
        ds_f = _slice(ds, f, 1)                      # (H, G, Bb)
        w_f = _slice(wgt, f, 1)                      # (H, G, Bb)
        q_f = _slice(q, f, 2)                        # (H, dh, Bb)
        dctx_f = _slice(dctx, f, 2)                  # (H, dh, Bb)
        dk = dk + ds_f[:, None, :, :] * q_f[:, :, None, :]
        dv = dv + w_f[:, None, :, :] * dctx_f[:, :, None, :]

    dpost = jnp.concatenate(
        [dq.reshape(U, f_ * bb), dk.reshape(U, f_ * bb),
         dv.reshape(U, f_ * bb), dr.reshape(U, f_ * bb)], axis=0)
    # masked projection gradient; the two projection-grad DOTS run in
    # XLA outside this kernel (dx is wide-N, dW a long reduction — both
    # MXU-fine there), because combining them with the attention-grad
    # loops in one kernel crashes the Mosaic compiler at grid>1
    # (round-4 bisection: each part compiles alone)
    dpre = jnp.where(pre > 0, dpost, 0.0)            # (4U, F*Bb)
    dpre_ref[...] = dpre.reshape(4 * U, f_, bb).astype(dpre_ref.dtype)


# Round-5 re-probe of the fused block (the round-4 crash at grid>1 now
# surfaces as a clean scoped-VMEM error on the current toolchain):
# bb=256 backward allocates 17.35 MB vs the 16 MB limit (fails), and at
# the VMEM-safe bb=128 one block's fwd+bwd measures 3.7-4.2 ms vs
# ~0.9 ms/block on the unfused default path — the fusion is
# uncompetitive on v5e at ANY feasible block size, not merely
# compiler-blocked.  Kept opt-in for chips with larger VMEM.
_AB_BUDGET_BYTES = 4_000_000


def _ab_per_lane(h, f, u):
    return (4 * h * f * f * 4          # scores/weights/ds/dwgt f32
            + 14 * u * f * 4)          # qkvr/dq/dk/dv/ctx-scale bufs


def _ab_pick_block(b, h, f, u, budget_bytes=_AB_BUDGET_BYTES):
    # budget leaves room for Pallas' grid>1 DOUBLE-BUFFERING of the
    # in/out blocks: an 11 MB single-buffer estimate compiled at grid=1
    # but blew the 16 MB VMEM at grid>1 (the compile helper dies with an
    # opaque exit-1 — round-4 diagnosis)
    bb = min(b, 1024)
    per_lane = _ab_per_lane(h, f, u)
    while bb > _LANE:
        if bb % _LANE == 0 and b % bb == 0 and bb * per_lane <= budget_bytes:
            break
        bb //= 2
    return max(bb, _LANE)


def attention_block_supported(num_heads, n_fields, u, batch) -> bool:
    """Whether the fused-block kernels may lower: besides the
    field_attention constraints, the minimum 128-lane block must be
    compileable.  The feasibility cutoff is 1.5× the block-choice
    budget (6 MB): `_ab_pick_block`'s 4 MB budget is a conservative
    *preference* for sizing larger blocks, while the measured compile
    boundary is the 16 MB scoped VMEM at ~1.93× the per-lane estimate
    (bb=256's 9 MB estimate allocated 17.35 MB and failed; the bench
    config's 4.5 MB estimate compiles) — 6 MB ≈ 11.6 MB actual keeps
    margin below the limit while still admitting the measured config."""
    return (supported(u // num_heads, batch, num_heads, n_fields)
            and _LANE * _ab_per_lane(num_heads, n_fields, u)
            <= int(1.5 * _AB_BUDGET_BYTES))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def attention_block(x, w_aug, scale, num_heads, d_head, interpret=False):
    """Whole AutoInt block (projections+relu+attention+residual+relu).

    x: (U, F, B) batch-minor; w_aug: (U+1, 4U) — [Wq|Wk|Wv|Wr] columns,
    biases in the last row.  Returns (U, F, B) in x.dtype.  BatchNorm is
    applied by the caller.
    """
    return _ab_fwd_impl(x, w_aug, scale, num_heads, d_head, interpret)


def _ab_fwd_impl(x, w_aug, scale, num_heads, d_head, interpret):
    U, f_, b = x.shape
    bb = _ab_pick_block(b, num_heads, f_, U)
    if b % bb:
        raise ValueError(f'batch {b} not a multiple of lane block {bb}')
    x_spec = pl.BlockSpec((U, f_, bb), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((U + 1, 4 * U), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ab_fwd_kernel, scale=scale, H=num_heads,
                          dh=d_head),
        grid=(b // bb,),
        in_specs=[x_spec, w_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((U, f_, b), x.dtype),
        interpret=interpret,
    )(x, w_aug.astype(x.dtype))


def _ab_fwd(x, w_aug, scale, num_heads, d_head, interpret):
    return (_ab_fwd_impl(x, w_aug, scale, num_heads, d_head, interpret),
            (x, w_aug))


def _ab_bwd(scale, num_heads, d_head, interpret, res, do):
    x, w_aug = res
    U, f_, b = x.shape
    bb = _ab_pick_block(b, num_heads, f_, U)
    x_spec = pl.BlockSpec((U, f_, bb), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((U + 1, 4 * U), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    dpre_spec = pl.BlockSpec((4 * U, f_, bb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    dpre = pl.pallas_call(
        functools.partial(_ab_bwd_kernel, scale=scale, H=num_heads,
                          dh=d_head),
        grid=(b // bb,),
        in_specs=[x_spec, w_spec, x_spec],
        out_specs=dpre_spec,
        out_shape=jax.ShapeDtypeStruct((4 * U, f_, b), x.dtype),
        interpret=interpret,
    )(x, w_aug.astype(x.dtype), do.astype(x.dtype))
    # projection-grad dots in XLA (wide-N / long-reduction shapes)
    dpre_m = dpre.reshape(4 * U, f_ * b)
    xa = jnp.concatenate(
        [x.reshape(U, f_ * b).astype(jnp.float32),
         jnp.ones((1, f_ * b), jnp.float32)], axis=0)
    dw = jax.lax.dot_general(xa, dpre_m.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxa = jax.lax.dot_general(
        w_aug.astype(jnp.float32), dpre_m.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (U+1, F*B)
    dx = dxa[:U].reshape(U, f_, b).astype(x.dtype)
    return dx, dw.astype(w_aug.dtype)


attention_block.defvjp(_ab_fwd, _ab_bwd)


def attention_block_oracle(x, w_aug, scale, num_heads, d_head):
    """jnp reference of the fused block (same layouts, f32 accumulate)."""
    U, f_, b = x.shape
    xa = jnp.concatenate([x.reshape(U, f_ * b).astype(jnp.float32),
                          jnp.ones((1, f_ * b), jnp.float32)], axis=0)
    post = jax.nn.relu(w_aug.astype(jnp.float32).T @ xa)  # (4U, F*B)
    q, k, v, r = [post[i * U:(i + 1) * U].reshape(
        num_heads, d_head, f_, b) for i in range(4)]
    s = jnp.einsum('hdfb,hdgb->hfgb', q, k) * scale
    w = jax.nn.softmax(s, axis=2)
    ctx = jnp.einsum('hfgb,hdgb->hdfb', w, v)
    out = jax.nn.relu((ctx + r).reshape(U, f_, b))
    return out.astype(x.dtype)
