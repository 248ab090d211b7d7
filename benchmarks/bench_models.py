# -*- coding:utf-8 -*-
"""Model-zoo throughput + accuracy benchmark harness.

Covers the BASELINE.json single-chip configs:
1. DeepFM on Criteo-style (26 cat + 13 dense)
2. Wide&Deep + DCN cross-net on Adult-style (8 cat + 6 dense)
3. xDeepFM with CIN 128x128 on Criteo-style (+ a Pallas-CIN variant)
4. AutoInt (3 blocks, 2 heads) on Avazu-style (22 cat)

Throughput uses the pipelined-fetch scan-chunk methodology (see
benchmarks/timing.py) — the same measurement discipline as bench.py — and
records XLA's own per-step cost analysis (flops, bytes accessed) plus a
roofline statement (which bound each config hits and what fraction of it
the measured step achieves).

Usage: python benchmarks/bench_models.py [quality|throughput|all]
Prints one JSON line per measurement and writes
benchmarks/results_models.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import timing  # noqa: E402

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'results_models.json')


def _throughput_for(nets, cat, dense, y, vocab_sizes, emb_dim=16,
                    batch_size=8192, bench_seconds=5.0, dtype='bfloat16',
                    steps_per_chunk=512, dnn_units=((1024, 0, False),
                                                    (512, 0, False)),
                    **config_kw):
    import jax
    import optax

    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib

    config = ModelConfig(
        nets=nets, metrics=['AUC'], task='binary', embedding_dropout=0,
        embeddings_output_dim=emb_dim, dtype_policy=dtype,
        dnn_params={'hidden_units': tuple(dnn_units), 'activation': 'relu'},
        home_dir='/tmp/dt_bench', **config_kw)
    cat_cols = tuple(CategoricalColumn(f'C{i + 1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = ()
    if dense is not None:
        cont_cols = (ContinuousColumn(
            'input_continuous_all',
            [f'I{i + 1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)

    n_batches = min(len(y) // batch_size, 8)

    def mk_stack():
        b = {'cat': jax.device_put(
            cat[:n_batches * batch_size].reshape(n_batches, batch_size, -1))}
        if dense is not None:
            b['input_continuous_all'] = jax.device_put(
                dense[:n_batches * batch_size].reshape(
                    n_batches, batch_size, -1))
        return b, jax.device_put(
            y[:n_batches * batch_size].reshape(n_batches, batch_size))

    sample = {'cat': cat[:2]}
    if dense is not None:
        sample['input_continuous_all'] = dense[:2]
    model.build(sample_batch=sample)
    tx = optax.adam(1e-3)
    model._tx = tx
    opt_state = jax.jit(tx.init)(model.variables['params'])
    module = model.module
    loss_fn = losses_lib.binary_crossentropy

    def train_step(params, batch_stats, opt_state, batch, yb, rng):
        def compute_loss(p):
            (logits, _), mutated = module.apply(
                {'params': p, 'batch_stats': batch_stats}, batch,
                training=True, rngs={'dropout': rng},
                mutable=['batch_stats'])
            return loss_fn(logits, yb), mutated.get('batch_stats', {})

        (loss, new_bs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    chunk = timing.make_train_chunk(train_step, n_batches, steps_per_chunk)
    chunk_jit = jax.jit(chunk, donate_argnums=(0, 1, 2))
    stacked = mk_stack()
    params = model.variables['params']
    bstats = model.variables.get('batch_stats', {})
    rng = jax.random.PRNGKey(0)

    # measure first (normal jit path); cost analysis second — its AOT
    # compile can be slow or unsupported, and must not block the numbers
    batch0 = {k: np.asarray(v[0]) for k, v in stacked[0].items()}
    y0 = np.asarray(stacked[1][0])
    res = timing.measure_chunked(chunk_jit, params, bstats, opt_state,
                                 stacked, rng, batch_size, steps_per_chunk,
                                 bench_seconds)
    cost = timing.step_cost_analysis(train_step, params, bstats, opt_state,
                                     batch0, y0, rng)
    out = {'examples_per_sec': round(res['examples_per_sec'], 1),
           'step_ms': round(res['step_seconds'] * 1e3, 4),
           'batch_size': batch_size, 'finite': res['finite']}
    if cost:
        out['flops_per_step'] = cost['flops']
        out['bytes_per_step'] = cost['bytes']
        rl = timing.roofline(res['step_seconds'], cost['flops'],
                             cost['bytes'])
        if rl.get('known_peaks'):
            out['roofline'] = {
                'device': rl['device_kind'],
                'mxu_bound_ms': round(rl['mxu_bound_ms'], 4),
                'hbm_bound_ms': round(rl['hbm_bound_ms'], 4),
                'bound': rl['bound'],
                'fraction_of_roofline': round(rl['roofline_fraction'], 3),
            }
    return out


def bench_throughput():
    from deeptables_tpu.data.datasets import (load_avazu_synthetic,
                                              load_criteo_synthetic)
    rng = np.random.default_rng(0)
    results = {}

    def emit(name, r):
        results[name] = r
        print(json.dumps({'metric': f'{name}_examples_per_sec', **r}),
              flush=True)

    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=8192 * 8, return_arrays=True)

    # 1. DeepFM / criteo
    emit('criteo_deepfm', _throughput_for(
        ['linear', 'fm_nets', 'dnn_nets'], cat, dense, y, vocab_sizes))

    # 3. xDeepFM / criteo (CIN 128x128) — einsum and Pallas variants
    cin = {'cross_layer_size': (128, 128), 'activation': 'relu'}
    emit('criteo_xdeepfm', _throughput_for(
        ['linear', 'cin_nets', 'dnn_nets'], cat, dense, y, vocab_sizes,
        cin_params=dict(cin)))
    emit('criteo_xdeepfm_pallas_cin', _throughput_for(
        ['linear', 'cin_nets', 'dnn_nets'], cat, dense, y, vocab_sizes,
        cin_params=dict(cin, use_pallas=True)))

    # 2. Wide&Deep + DCN / adult-style (8 cat of modest vocab + 6 dense)
    adult_vocabs = np.asarray([9, 16, 7, 15, 6, 5, 2, 42], np.int64)
    n = 8192 * 8
    cat_ad = np.stack([rng.integers(0, v, n) for v in adult_vocabs],
                      axis=1).astype(np.int32)
    dense_ad = rng.normal(size=(n, 6)).astype(np.float32)
    y_ad = rng.integers(0, 2, n).astype(np.float32)
    emit('adult_widedeep_dcn', _throughput_for(
        ['linear', 'dnn_nets', 'dcn_nets'], cat_ad, dense_ad, y_ad,
        adult_vocabs - 1))

    # 4. AutoInt / avazu-style (22 cat)
    df = load_avazu_synthetic(8192 * 8)
    y_av = df.pop('click').to_numpy(np.float32)
    cat_av = df.to_numpy(np.int64)
    vocabs = cat_av.max(axis=0) + 1
    emit('avazu_autoint', _throughput_for(
        ['autoint_nets'], cat_av.astype(np.int32), None, y_av, vocabs,
        autoint_params={'num_attention': 3, 'num_heads': 2,
                        'dropout_rate': 0, 'use_residual': True}))

    with open(_OUT, 'w') as f:
        json.dump({'method': 'pipelined-fetch scan-chunk (benchmarks/timing)',
                   'throughput': results}, f, indent=1)
    print(f'wrote {_OUT}', flush=True)
    return results


def bench_quality():
    from sklearn.model_selection import train_test_split

    from deeptables_tpu.data.datasets import (load_adult, load_bank,
                                              load_criteo_synthetic)
    from deeptables_tpu.models import DeepTable, ModelConfig

    results = {}

    def run(name, df, target, nets, epochs=8, **kw):
        y = np.asarray(df.pop(target))
        X_train, X_test, y_train, y_test = train_test_split(
            df, y, test_size=0.2, random_state=42, stratify=y)
        conf = ModelConfig(nets=nets, metrics=['AUC', 'logloss'],
                           earlystopping_patience=3, home_dir='/tmp/dt_bench',
                           **kw)
        dt = DeepTable(config=conf)
        t0 = time.time()
        dt.fit(X_train, y_train, epochs=epochs, batch_size=512, verbose=0)
        fit_s = time.time() - t0
        score = dt.evaluate(X_test, y_test, verbose=0)
        results[name] = {'auc': score['AUC'], 'logloss': score['logloss'],
                         'fit_seconds': fit_s}
        print(json.dumps({'metric': f'{name}_auc',
                          'value': round(score['AUC'], 4),
                          'logloss': round(score['logloss'], 4),
                          'fit_seconds': round(fit_s, 1)}), flush=True)

    run('bank_deepfm', load_bank(20000),
        'y', ['linear', 'fm_nets', 'dnn_nets'])
    run('adult_widedeep_dcn', load_adult(20000), 14,
        ['linear', 'dnn_nets', 'dcn_nets'])
    # criteo/avazu synthetic categorical fields are int-coded → must be
    # declared explicitly (auto triage would treat them as numeric and
    # silently skip the CIN/attention nets — round-4 fix)
    criteo = load_criteo_synthetic(60000)
    run('criteo_xdeepfm', criteo, 'label',
        ['linear', 'cin_nets', 'dnn_nets'],
        cin_params={'cross_layer_size': (64, 64), 'activation': 'relu'},
        embeddings_output_dim=8,
        categorical_columns=[f'C{i}' for i in range(1, 27)])
    from deeptables_tpu.data.datasets import load_avazu_synthetic
    avazu = load_avazu_synthetic(60000)
    run('avazu_autoint', avazu, 'click', ['autoint_nets'],
        autoint_params={'num_attention': 3, 'num_heads': 2,
                        'dropout_rate': 0, 'use_residual': True},
        categorical_columns=[c for c in avazu.columns if c != 'click'])
    return results


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if mode in ('throughput', 'all'):
        bench_throughput()
    if mode in ('quality', 'all'):
        bench_quality()
