# -*- coding:utf-8 -*-
"""Model-zoo throughput + accuracy benchmark harness.

Covers the BASELINE.md configs:
1. DeepFM on bank-marketing (accuracy)
2. Wide&Deep + DCN on Adult (accuracy)
3. xDeepFM/CIN on Criteo sample (throughput + accuracy)
4. AutoInt on Avazu (throughput + accuracy)

Usage: python benchmarks/bench_models.py [quality|throughput|all]
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _throughput_for(nets, cat, dense, y, vocab_sizes, emb_dim=16,
                    batch_size=8192, bench_seconds=5.0, dtype='bfloat16',
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
        home_dir='/tmp/dt_bench', **config_kw)
    cat_cols = tuple(CategoricalColumn(f'C{i + 1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = ()
    if dense is not None:
        cont_cols = (ContinuousColumn(
            'input_continuous_all',
            [f'I{i + 1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)

    def mk_batch(sl):
        b = {'cat': cat[sl]}
        if dense is not None:
            b['input_continuous_all'] = dense[sl]
        return b

    model.build(sample_batch=mk_batch(slice(0, 2)))
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

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    n_batches = len(y) // batch_size
    batches = []
    for i in range(min(n_batches, 8)):
        sl = slice(i * batch_size, (i + 1) * batch_size)
        batches.append((
            {k: jax.device_put(v) for k, v in mk_batch(sl).items()},
            jax.device_put(y[sl])))

    params = model.variables['params']
    bstats = model.variables.get('batch_stats', {})
    rng = jax.random.PRNGKey(0)
    for i in range(10):
        b, yb = batches[i % len(batches)]
        params, bstats, opt_state, loss = step(params, bstats, opt_state,
                                               b, yb, rng)
    jax.block_until_ready(loss)
    steps = 0
    t0 = time.perf_counter()
    while True:
        b, yb = batches[steps % len(batches)]
        params, bstats, opt_state, loss = step(params, bstats, opt_state,
                                               b, yb, rng)
        steps += 1
        if steps % 20 == 0:
            jax.block_until_ready(loss)
            if time.perf_counter() - t0 >= bench_seconds:
                break
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0
    return steps * batch_size / elapsed


def bench_throughput():
    from deeptables_tpu.data.datasets import (load_avazu_synthetic,
                                              load_criteo_synthetic)
    results = {}

    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=8192 * 8, return_arrays=True)
    for name, nets in [
            ('deepfm', ['linear', 'fm_nets', 'dnn_nets']),
            ('xdeepfm', ['linear', 'cin_nets', 'dnn_nets']),
            ('autoint', ['autoint_nets'])]:
        kw = {}
        if name == 'xdeepfm':
            kw['cin_params'] = {'cross_layer_size': (128, 128),
                                'activation': 'relu'}
        if name == 'autoint':
            kw['autoint_params'] = {'num_attention': 3, 'num_heads': 2,
                                    'dropout_rate': 0, 'use_residual': True}
        eps = _throughput_for(nets, cat, dense, y, vocab_sizes, **kw)
        results[f'criteo_{name}'] = eps
        print(json.dumps({'metric': f'criteo_{name}_examples_per_sec',
                          'value': round(eps, 1), 'unit': 'examples/s'}))

    df = load_avazu_synthetic(8192 * 8)
    y_av = df.pop('click').to_numpy(np.float32)
    cat_av = df.to_numpy(np.int64)
    vocabs = cat_av.max(axis=0) + 1
    eps = _throughput_for(['autoint_nets'], cat_av.astype(np.int32), None,
                          y_av, vocabs)
    results['avazu_autoint'] = eps
    print(json.dumps({'metric': 'avazu_autoint_examples_per_sec',
                      'value': round(eps, 1), 'unit': 'examples/s'}))
    return results


def bench_quality():
    import pandas as pd
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
                          'fit_seconds': round(fit_s, 1)}))

    run('bank_deepfm', load_bank(20000),
        'y', ['linear', 'fm_nets', 'dnn_nets'])
    run('adult_widedeep_dcn', load_adult(20000), 14,
        ['linear', 'dnn_nets', 'dcn_nets'])
    criteo = load_criteo_synthetic(60000)
    run('criteo_xdeepfm', criteo, 'label',
        ['linear', 'cin_nets', 'dnn_nets'],
        cin_params={'cross_layer_size': (64, 64), 'activation': 'relu'},
        embeddings_output_dim=8)
    return results


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if mode in ('throughput', 'all'):
        bench_throughput()
    if mode in ('quality', 'all'):
        bench_quality()
