# -*- coding:utf-8 -*-
"""End-to-end ingest-to-device throughput (VERDICT r3 next-step #6).

bench.py times pre-staged device tensors; at 2.5M+ examples/s the host
must parse and pack ~250 MB/s of raw Criteo TSV to keep the chip fed.
This benchmark answers whether it can:

1. generates a multi-GB synthetic Criteo TSV (raw text, on disk),
2. measures the ingest-only ceiling: ``native/fast_ingest`` parse +
   hash + pack → (labels, dense, cats) chunks (no device),
3. measures sustained TRAINING examples/s with ingest in the loop:
   CriteoTsvSource → CriteoStreamLoader → ``DeepModel.fit`` on the
   DeepFM bench config (B=8192, bf16), one epoch over the file.

Usage: python benchmarks/bench_ingest_e2e.py [n_rows]
Writes benchmarks/ingest_e2e_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'ingest_e2e_results.json')


def make_tsv(path, n_rows, seed=0, chunk=200_000):
    """Synthetic Criteo-format TSV: label, 13 ints (some blank), 26 hex."""
    rng = np.random.default_rng(seed)
    t0 = time.time()
    with open(path, 'w') as f:
        for s in range(0, n_rows, chunk):
            n = min(chunk, n_rows - s)
            label = rng.integers(0, 2, n)
            dense = rng.integers(0, 5000, (n, 13))
            blank = rng.random((n, 13)) < 0.1
            cats = rng.integers(0, 1 << 32, (n, 26), dtype=np.uint64)
            rows = []
            for i in range(n):
                dvals = ['' if blank[i, j] else str(dense[i, j])
                         for j in range(13)]
                cvals = [format(int(v), '08x') for v in cats[i]]
                rows.append('\t'.join([str(label[i])] + dvals + cvals))
            f.write('\n'.join(rows) + '\n')
    size = os.path.getsize(path)
    print(f'wrote {path}: {n_rows} rows, {size/1e9:.2f} GB in '
          f'{time.time()-t0:.1f}s', flush=True)
    return size


def main():
    from deeptables_tpu.data.fast_ingest import CriteoTsvSource, have_native
    from deeptables_tpu.data.criteo import (CriteoStreamLoader,
                                            criteo_columns)
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    path = '/tmp/dt_bench_criteo.tsv'
    hash_buckets = [100_000] * 7 + [8192] * 19  # criteo-like mix

    if not (os.path.exists(path)
            and os.environ.get('INGEST_REUSE', '1') == '1'):
        size = make_tsv(path, n_rows)
    else:
        size = os.path.getsize(path)

    results = {'tsv_bytes': size, 'n_rows': n_rows,
               'native_parser': bool(have_native())}

    # --- ingest-only ceiling ---------------------------------------------
    src = CriteoTsvSource([path], hash_buckets=hash_buckets,
                          chunk_bytes=64 << 20)
    t0 = time.perf_counter()
    rows = 0
    for labels, dense, cats in src.iter_chunks():
        rows += len(labels)
    dt_ing = time.perf_counter() - t0
    results['ingest_only'] = {
        'rows_per_sec': round(rows / dt_ing, 1),
        'bytes_per_sec': round(size / dt_ing, 1),
        'seconds': round(dt_ing, 2), 'rows': rows}
    print(json.dumps({'ingest_only': results['ingest_only']}), flush=True)

    # --- train with ingest in the loop -----------------------------------
    cat_cols, cont_cols = criteo_columns(hash_buckets, emb_dim=16)
    config = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'], metrics=['AUC'],
        task='binary', embedding_dropout=0, embeddings_output_dim=16,
        dnn_params={'hidden_units': ((1024, 0, False), (512, 0, False)),
                    'activation': 'relu'},
        dtype_policy='bfloat16', earlystopping_patience=0,
        # round-5 sweep (BASELINE.md e2e ingest bullet): per-step 35.6k,
        # chunk 8 → 50-60k, chunk 16 → 78-91k, chunk 64 → 38-47k
        # (64 stalls the 2-core host on stacking/buffering); 16 is the
        # sweet spot on this platform
        train_steps_per_dispatch=int(
            os.environ.get('INGEST_CHUNK_STEPS', '16')),
        home_dir='/tmp/dt_bench')
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)
    loader = CriteoStreamLoader(
        CriteoTsvSource([path], hash_buckets=hash_buckets,
                        chunk_bytes=64 << 20),
        batch_size=8192, shuffle=True)
    n_steps = rows // 8192
    t0 = time.perf_counter()
    model.fit(loader, epochs=1, verbose=0)
    dt_fit = time.perf_counter() - t0
    results['train_with_ingest'] = {
        'examples_per_sec': round(n_steps * 8192 / dt_fit, 1),
        'seconds': round(dt_fit, 2), 'steps': n_steps,
        'note': 'includes one-time jit compile; ingest+h2d+train overlap '
                'via the loader lookahead thread'}
    print(json.dumps({'train_with_ingest': results['train_with_ingest']}),
          flush=True)

    with open(_OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print(f'wrote {_OUT}', flush=True)


if __name__ == '__main__':
    main()
