# -*- coding:utf-8 -*-
"""Micro-benchmarks for the embedding hot path (fwd gather / bwd kernel /
tail scatter variants) on the criteo DeepFM shapes.  Scan-timed like
bench.py.

Usage: python benchmarks/micro_emb.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=64, rounds=3, donate=False):
    """Per-call seconds of fn(*args) under a scan (args closed over)."""
    import jax
    import jax.numpy as jnp

    def chunk(acc):
        def body(carry, i):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.astype(jnp.float32).ravel()[0], ()

        return jax.lax.scan(body, acc, np.arange(steps, dtype=np.int32))

    cj = jax.jit(chunk)
    acc, _ = cj(jnp.float32(0))
    np.asarray(acc)
    t0 = time.perf_counter()
    prev = None
    for _ in range(rounds):
        acc, _ = cj(acc)
        if prev is not None:
            np.asarray(prev)
        prev = acc
    np.asarray(prev)
    return (time.perf_counter() - t0) / (rounds * steps)


def main():
    import jax
    import jax.numpy as jnp

    from deeptables_tpu.data.datasets import load_criteo_synthetic
    from deeptables_tpu.ops import embedding as emb_lib
    from deeptables_tpu.ops.kernels.emb_grad import TILE_P, emb_grad_matmul

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    dim = 16
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=B, return_arrays=True)
    input_dims = [int(v) + 1 for v in vocab_sizes]
    k = emb_lib._pack_factor(dim)

    plan = emb_lib.plan_groups(input_dims, [dim] * len(input_dims))
    (d, col_indices, offsets, total_vocab, aligned), = plan
    assert aligned and d == dim
    n_packed, w = emb_lib.packed_shape(total_vocab, dim)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n_packed, w)).astype(np.float32))
    ids2 = np.asarray(cat)[:, col_indices] + np.asarray(offsets)
    ids2 = jnp.asarray(ids2.astype(np.int32))
    flat = ids2.reshape(-1)
    g3 = jnp.asarray(rng.normal(size=(B, len(col_indices), dim))
                     .astype(np.float32))

    vocabs = [input_dims[c] for c in col_indices]
    n_small = sum(1 for v in vocabs
                  if v <= emb_lib.SCATTER_MIN_VOCAB)
    align = k * TILE_P
    p_small = sum(-(-vocabs[j] // align) * align for j in range(n_small)) // k
    col_steps = []
    ps = 0
    for j in range(n_small):
        tiles = -(-vocabs[j] // align)
        col_steps.extend((j, ps // TILE_P + t) for t in range(tiles))
        ps += tiles * TILE_P
    print(f'B={B} cols={len(vocabs)} n_small={n_small} packed={n_packed} '
          f'p_small={p_small} steps={len(col_steps)}')

    only = os.environ.get('MICRO_ONLY', '')

    def want(name):
        return (not only) or any(tok in name for tok in only.split(','))

    def report(name, sec):
        print(f'{name:36s} {sec*1e6:9.1f} us', flush=True)

    def run(name, fn):
        if want(name):
            try:
                report(name, timed(fn, ()))
            except Exception as e:  # experimental kernels may not lower
                msg = str(e).splitlines()[0][:90] if str(e) else type(e).__name__
                print(f'{name:36s}    FAILED: {msg}', flush=True)

    # forward: full fused packed gather + k-select
    run('fwd packed_lookup (all cols)',
        lambda: emb_lib.packed_lookup(table, flat, dim))

    # forward: tail (big cols) only
    flat_tail = ids2[:, n_small:].reshape(-1)
    run('fwd packed_lookup (tail only)',
        lambda: emb_lib.packed_lookup(table, flat_tail, dim))

    # forward: raw take (no k-select)
    run('fwd raw take packed rows',
        lambda: jnp.take(table, flat // k, axis=0))

    # (the Pallas DMA-per-row gather + fused a2a owner-gather kernels were
    # REMOVED in round 5 after two declines — measured 33.4 ms vs the
    # 433 µs fused gather / no Mosaic row-gather lowering; the records
    # live in BASELINE.md "Embedding hot-path micro-benchmarks")

    # owner-side masked gather (sharded_lookup_a2a): the jnp 3-op path
    packed_ids = flat // k

    def masked_take():
        rel = packed_ids - 0
        valid = (rel >= 0) & (rel < n_packed)
        rows = jnp.take(table, jnp.clip(rel, 0, n_packed - 1), axis=0)
        return jnp.where(valid[:, None], rows, 0)

    run('a2a owner gather: jnp take+mask', masked_take)

    # bwd kernel at different chunk sizes
    ids_small = ids2[:, :n_small]
    g_small = g3[:, :n_small]
    for mc in (2048, 4096, 8192):
        run(f'bwd kernel max_chunk={mc}',
            lambda mc=mc: emb_grad_matmul(ids_small, g_small,
                                          tuple(col_steps), p_small, k, dim,
                                          max_chunk=mc))

    # bwd tail scatter (logical-row scatter + contiguous repack, as
    # production — see ops/embedding.py scatter_grad)
    def tail_scatter():
        idsr = ids2[:, n_small:].reshape(-1)
        gr = g3[:, n_small:].reshape(-1, dim)
        out = jnp.zeros(((n_packed - p_small) * k, dim), jnp.float32)
        return out.at[idsr - p_small * k].add(gr).reshape(-1, k * dim)

    run('bwd tail scatter (7 cols)', tail_scatter)

    # bwd all-scatter
    def all_scatter():
        gr = g3.reshape(-1, dim)
        out = jnp.zeros((n_packed * k, dim), jnp.float32)
        return out.at[flat].add(gr).reshape(-1, k * dim)

    run('bwd all scatter (26 cols)', all_scatter)


if __name__ == '__main__':
    main()
