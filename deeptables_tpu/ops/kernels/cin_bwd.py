# -*- coding:utf-8 -*-
"""Fused CIN backward kernel (batch-minor, pair operands kept in VMEM).

Round-4 measurement chain (BASELINE.md xDeepFM bullet): the xDeepFM step is
dominated by the backward of the CIN contraction
``z_bld = sum_fg x0_bfd h_bgd w_lfg``.  The best XLA formulation
(``ops/cin_grad.py`` 'bm') is HBM-bound: it materializes the
(F·G, D·B)-scale ``dpair`` and ``pair`` operands in HBM (~3 GB/step of
traffic at the bench config — 9.3 ms step vs 10.4 autodiff).

This kernel computes the whole input/weight gradient per batch-lane block
with the pair operands living only in VMEM:

    dpair = W^T @ dz          (FG, Nb) f32     — one MXU dot
    dx0   = sum_g dpair(F,G,·) * h             — VPU reduce
    dh    = sum_f dpair(F,G,·) * x0            — VPU reduce
    pair  = x0 ⊗ h            (FG, Nb) bf16    — VPU broadcast-mul
    dW   += dz @ pair^T       (L, FG)  f32     — one MXU dot, accumulated
                                                 across the sequential grid

Layouts are batch-minor ((rows, D·B) with D·B on lanes) — the orientation
that fixed AutoInt in round 3.  HBM traffic drops to the x0/h/dz operand
reads (~150 MB/step) plus the dx0/dh writes; the bound moves to the Mosaic
dot rate at (F·G, L)x(L, Nb) shapes, measured in-situ by
``benchmarks/profile_cin_bwd.py`` before adoption.

Reference semantics: deeptables/models/layers.py:690-705 (CIN conv1d over
per-dim outer products).  Oracle tests (interpret mode):
tests/test_kernels.py::TestCinBwdKernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _bwd_kernel(x0_ref, h_ref, w_ref, dz_ref, dx0_ref, dh_ref, dw_ref):
    F, nb = x0_ref.shape
    G = h_ref.shape[0]
    dz = dz_ref[...]                                       # (L, Nb) bf16
    w = w_ref[...]                                         # (L, F*G) bf16
    # dpair_fg,b = sum_l w_l,fg dz_l,b
    dpair = jax.lax.dot_general(
        w, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (FG, Nb)
    dp3 = dpair.reshape(F, G, nb)
    x0 = x0_ref[...].astype(jnp.float32)                   # (F, Nb)
    h = h_ref[...].astype(jnp.float32)                     # (G, Nb)
    dx0_ref[...] = (dp3 * h[None, :, :]).sum(1).astype(dx0_ref.dtype)
    dh_ref[...] = (dp3 * x0[:, None, :]).sum(0).astype(dh_ref.dtype)
    # pair_fg,b = x0_f,b h_g,b ;  dW_l,fg += sum_b dz_l,b pair_fg,b
    pair = (x0[:, None, :] * h[None, :, :]).reshape(F * G, nb) \
        .astype(dz.dtype)
    dwb = jax.lax.dot_general(
        dz, pair, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (L, FG)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = dwb

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw_ref[...] += dwb


def _bwd_kernel_chunked(x0_ref, h_ref, w_ref, dz_ref, dx0_ref, dh_ref,
                        dw_ref, *, chunks, G):
    """F-chunked variant (round 5, VERDICT r4 item 1): the (F·G, Nb) pair
    operands are materialized one F-chunk at a time, so the per-lane VMEM
    footprint scales with ``fc·G`` instead of ``F·G`` and the lane block
    reaches Nb=1024 at shapes where the whole-F kernel is budget-capped
    at 512 (the xDeepFM layer-2 shape F=26, G=64, L=128).

    ``chunks`` is a static tuple of (f0, fc) with every ``f0 % 8 == 0``
    (sublane-aligned x0/dx0 slices) and every ``f0*G % 128 == 0``
    (lane-aligned w/dW slices) — offsets stay tile-aligned so the static
    slices lower without relayouts.  dh accumulates across chunks in an
    in-kernel f32 value; dW accumulates per chunk across the sequential
    grid exactly like the whole-F kernel.
    """
    nb = x0_ref.shape[1]
    L = dz_ref.shape[0]
    dz = dz_ref[...]                                       # (L, Nb) bf16
    h = h_ref[...].astype(jnp.float32)                     # (G, Nb)
    dh_acc = jnp.zeros(h.shape, jnp.float32)
    for f0, fc in chunks:
        wc = w_ref[:, f0 * G:(f0 + fc) * G]                # (L, fc*G)
        dpair = jax.lax.dot_general(
            wc, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (fc*G, Nb)
        dp3 = dpair.reshape(fc, G, nb)
        x0c = x0_ref[f0:f0 + fc].astype(jnp.float32)       # (fc, Nb)
        dx0_ref[f0:f0 + fc] = (dp3 * h[None, :, :]).sum(1) \
            .astype(dx0_ref.dtype)
        dh_acc = dh_acc + (dp3 * x0c[:, None, :]).sum(0)
        pair = (x0c[:, None, :] * h[None, :, :]).reshape(fc * G, nb) \
            .astype(dz.dtype)
        dwb = jax.lax.dot_general(
            dz, pair, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (L, fc*G)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw_ref[:, f0 * G:(f0 + fc) * G] = dwb

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            dw_ref[:, f0 * G:(f0 + fc) * G] += dwb
    dh_ref[...] = dh_acc.astype(dh_ref.dtype)


def _chunk_plan(F, G, want=None):
    """Static F-chunks with tile-aligned offsets, or None when chunking
    cannot keep every offset aligned (then the whole-F kernel is used).

    Base chunk size: the smallest multiple of 8 whose lane extent
    ``fc*G`` is a multiple of 128 (so successive offsets stay lane-tile
    aligned); ``want`` requests a larger size (rounded up to a multiple
    of the base)."""
    if G % 8:
        return None
    base = 8
    while (base * G) % _LANE:
        base += 8
    fc = base if not want else -(-int(want) // base) * base
    if fc >= F:
        return None
    chunks = []
    f0 = 0
    while f0 < F:
        chunks.append((f0, min(fc, F - f0)))
        f0 += fc
    # every chunk's lane EXTENT must also be a multiple of 128 — a
    # sub-lane-tile tail slice of w/dW (e.g. F=20, G=16 → tail 4*16=64
    # lanes) was never compiled on hardware; reject rather than risk a
    # Mosaic failure on this opt-in path (review round-5 finding)
    if any((c * G) % _LANE for _, c in chunks):
        return None
    return tuple(chunks)


def _fwd_kernel(x0_ref, h_ref, w_ref, z_ref):
    F, nb = x0_ref.shape
    G = h_ref.shape[0]
    x0 = x0_ref[...]                                       # (F, Nb) bf16
    h = h_ref[...]                                         # (G, Nb)
    # pair_fg,b = x0_f,b h_g,b ;  z_l,b = sum_fg w_l,fg pair_fg,b
    pair = (x0[:, None, :] * h[None, :, :]).reshape(F * G, nb)
    z_ref[...] = jax.lax.dot_general(
        w_ref[...], pair, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def cin_fwd_pallas(x0T, hT, w2, interpret=False, block_lanes=None):
    """Forward of the CIN contraction, batch-minor operands; the
    (F·G, Nb) pair lives only in VMEM (the XLA einsum materializes it in
    HBM — ~1.3 GB/step round-trip at the xDeepFM bench config).

    x0T: (F, DB), hT: (G, DB), w2: (L, F*G).  Returns zT (L, DB) f32.
    """
    F, db = x0T.shape
    G = hT.shape[0]
    L = w2.shape[0]
    Gp = -(-G // 8) * 8  # same sublane-alignment rule as the backward
    if Gp != G:
        hT = jnp.pad(hT, ((0, Gp - G), (0, 0)))
        w2 = jnp.pad(w2.reshape(L, F, G),
                     ((0, 0), (0, 0), (0, Gp - G))).reshape(L, F * Gp)
        return cin_fwd_pallas(x0T, hT, w2, interpret, block_lanes)
    nb = block_lanes or _pick_block(db, F, G, L)
    if db % nb:
        raise ValueError(f'batch-dim {db} not a multiple of block {nb}')
    cd = x0T.dtype
    row_spec = lambda rows: pl.BlockSpec((rows, nb), lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((L, F * G), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(db // nb,),
        in_specs=[row_spec(F), row_spec(G), full_spec],
        out_specs=row_spec(L),
        out_shape=jax.ShapeDtypeStruct((L, db), jnp.float32),
        interpret=interpret,
    )(x0T, hT.astype(cd), w2.astype(cd))


def _budget_bytes():
    import os
    return int(float(os.environ.get('DT_CIN_BWD_VMEM_MB', '13')) * 1e6)


def _footprint(f, g, l, chunk_f=None):
    """(fixed_bytes, per_lane_bytes) VMEM estimate for the backward kernel
    at padded shapes (g must already be the sublane-padded Gp).  With
    ``chunk_f`` the pair temporaries scale with the chunk, not F."""
    fc = chunk_f or f
    per_lane = (2 * fc * g * 4     # dpair f32 + the mul-reduce temp
                + fc * g * 2       # pair bf16
                + l * 2            # dz bf16
                + (2 * f + 2 * g) * 4)
    fixed = l * f * g * (2 + 4)    # w bf16 + dW accumulator f32
    return fixed, per_lane


def _pick_block(db, f, g, l, budget_bytes=None, chunk_f=None):
    """Largest lane block (multiple of 128 dividing db) fitting VMEM.

    Budget via ``DT_CIN_BWD_VMEM_MB`` (default 13): at the xDeepFM bench
    config the layer-2 block is the Nb=512 / Nb=256 boundary — in-situ A/B
    (profile_cin_bwd) picked the default."""
    if budget_bytes is None:
        budget_bytes = _budget_bytes()
    nb = min(db, 1024)
    fixed, per_lane = _footprint(f, g, l, chunk_f)
    while nb > _LANE:
        if nb % _LANE == 0 and db % nb == 0 \
                and fixed + nb * per_lane <= budget_bytes:
            break
        nb //= 2
    return max(nb, _LANE)


def cin_bwd_pallas(x0T, hT, w2, dzT, interpret=False, block_lanes=None,
                   chunk_f=None):
    """Backward of the CIN contraction, batch-minor operands.

    x0T: (F, DB) bf16, hT: (G, DB), w2: (L, F*G), dzT: (L, DB).
    Returns (dx0T (F, DB), dhT (G, DB), dW (L, F*G) f32).

    ``chunk_f``: None = read ``DT_CIN_BWD_CHUNK_F`` (default '0': whole-F
    kernel); 'auto' chunks the F axis in-kernel whenever that unlocks a
    larger lane block; an int forces that chunk size (rounded to the
    alignment rule in ``_chunk_plan``).

    **Measured and DECLINED as default (round 5, VERDICT r4 item 1):**
    the Nb=1024-via-F-split lever is neutral at the xDeepFM bench shapes.
    Per-kernel (micro_cin): layer-2 (F=26, G=64, L=128) whole-F Nb=512
    1090 µs / 102.5 TF/s vs chunked fc=8 Nb=1024 1100 µs / fc=16 Nb=1024
    1071 µs (104.2 TF/s, within the ~5% run variance); layer-1 strictly
    worse (757 → 820 µs at fc=8).  In-situ full-step A/B
    (profile_cin_bwd, DT_CIN_BWD_CHUNK_F ∈ {0, 16, auto}): 5.788 / 5.778
    / 5.815 ms — neutral.  The backward is not lane-block-bound at these
    shapes; the remaining gap to peak is the bf16 dot pipeline and the
    VPU mul-reduce passes, not Nb.
    """
    F, db = x0T.shape
    G = hT.shape[0]
    L = w2.shape[0]
    # the in-kernel (F*G, Nb) ↔ (F, G, Nb) reshapes are only
    # relayout-free when every f-plane starts on a sublane-tile boundary,
    # i.e. G % 8 == 0 (measured: G=26 ran at 34 TFLOP/s vs G=64 at 104).
    # Pad G with zero h-rows / zero w-columns — the padded terms
    # contribute exact zeros to dx0/dW and the padded dh rows are sliced
    # away.
    Gp = -(-G // 8) * 8
    if Gp != G:
        hT = jnp.pad(hT, ((0, Gp - G), (0, 0)))
        w3 = w2.reshape(L, F, G)
        w2 = jnp.pad(w3, ((0, 0), (0, 0), (0, Gp - G))).reshape(L, F * Gp)
        out = cin_bwd_pallas(x0T, hT, w2, dzT, interpret, block_lanes,
                             chunk_f)
        dx0T, dhT, dwp = out
        return (dx0T, dhT[:G],
                dwp.reshape(L, F, Gp)[:, :, :G].reshape(L, F * G))
    if chunk_f is None:
        import os
        env = os.environ.get('DT_CIN_BWD_CHUNK_F', '0')
        chunk_f = env if env == 'auto' else int(env)
    chunks = None
    if chunk_f == 'auto':
        # chunk only when it unlocks a larger lane block than whole-F
        nb_whole = _pick_block(db, F, G, L)
        if nb_whole < min(db, 1024):
            plan = _chunk_plan(F, G)
            if plan is not None:
                fc = plan[0][1]
                if _pick_block(db, F, G, L, chunk_f=fc) > nb_whole:
                    chunks = plan
    elif chunk_f:
        chunks = _chunk_plan(F, G, want=chunk_f)
    if chunks is not None:
        kernel = functools.partial(_bwd_kernel_chunked, chunks=chunks, G=G)
        nb = block_lanes or _pick_block(db, F, G, L,
                                        chunk_f=chunks[0][1])
    else:
        kernel = _bwd_kernel
        nb = block_lanes or _pick_block(db, F, G, L)
    if db % nb:
        raise ValueError(f'batch-dim {db} not a multiple of block {nb}')
    cd = x0T.dtype
    row_spec = lambda rows: pl.BlockSpec((rows, nb), lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((L, F * G), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(db // nb,),
        in_specs=[row_spec(F), row_spec(G), full_spec, row_spec(L)],
        out_specs=[row_spec(F), row_spec(G), full_spec],
        out_shape=[jax.ShapeDtypeStruct((F, db), cd),
                   jax.ShapeDtypeStruct((G, db), cd),
                   jax.ShapeDtypeStruct((L, F * G), jnp.float32)],
        interpret=interpret,
    )(x0T, hT, w2.astype(cd), dzT)


def supported(F, G, L, db, dtype) -> bool:
    """Mosaic-lowering constraints for the backward kernel.

    Besides the layout rules, require that even the *minimum* lane block
    fits the VMEM budget (the kernel pads G to the sublane tile, so the
    footprint check must use the padded Gp).  A config too large for the
    smallest block (e.g. ~100 fields at cross_layer_size 128) would
    otherwise dispatch the kernel and fail at compile/run time instead of
    falling back to the partitionable XLA 'bm' path.
    """
    Gp = -(-G // 8) * 8
    fixed, per_lane = _footprint(F, Gp, L)
    return (db % _LANE == 0
            and L % 8 == 0
            and dtype in (jnp.bfloat16, jnp.float32)
            and fixed + _LANE * per_lane <= _budget_bytes())


def cin_bwd_oracle(x0T, hT, w2, dzT):
    """jnp reference (same batch-minor layouts, f32 accumulation)."""
    F, db = x0T.shape
    G = hT.shape[0]
    dpair = jnp.einsum('lp,lb->pb', w2.astype(jnp.float32),
                       dzT.astype(jnp.float32)).reshape(F, G, db)
    dx0 = jnp.einsum('fgb,gb->fb', dpair, hT.astype(jnp.float32))
    dh = jnp.einsum('fgb,fb->gb', dpair, x0T.astype(jnp.float32))
    pair = (x0T.astype(jnp.float32)[:, None, :]
            * hT.astype(jnp.float32)[None, :, :]).reshape(F * G, db)
    dw = jnp.einsum('lb,pb->lp', dzT.astype(jnp.float32), pair)
    return dx0.astype(x0T.dtype), dh.astype(hT.dtype), dw
