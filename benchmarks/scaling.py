# -*- coding:utf-8 -*-
"""Weak-scaling measurement over a device mesh.

Target (BASELINE.md): ≥90% weak-scaling efficiency — per-chip throughput
with N data-parallel devices vs 1 device, with the global batch scaled by N.

On real multi-chip hardware this measures ICI collectives; in this
environment (one real chip) run it on the virtual CPU mesh to validate the
scaling *path*:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_devices, per_device_batch=2048, bench_seconds=3.0,
            emb_dim=16, sharded_tables=False):
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deeptables_tpu.data.datasets import load_criteo_synthetic
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib
    from deeptables_tpu.parallel.mesh import (DataAndModelParallel,
                                              DataParallel, build_mesh)

    model_parallel = 2 if sharded_tables and n_devices % 2 == 0 else 1
    data_parallel = n_devices // model_parallel
    if sharded_tables:
        strategy = DataAndModelParallel(
            data_parallel=data_parallel, model_parallel=model_parallel,
            mesh=build_mesh(data_parallel, model_parallel))
    else:
        strategy = DataParallel(
            mesh=build_mesh(data_parallel, model_parallel))

    batch_size = per_device_batch * data_parallel
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * 4, return_arrays=True)
    # vocab rounded so tables divide the model axis
    vocab_sizes = ((vocab_sizes // 8 + 1) * 8).astype(np.int64)

    config = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'], metrics=['AUC'],
        task='binary', embedding_dropout=0, embeddings_output_dim=emb_dim,
        distribute_strategy=strategy,
        embedding_device_strategy='sharded' if sharded_tables
        else 'replicated',
        home_dir='/tmp/dt_bench')
    cat_cols = tuple(CategoricalColumn(f'C{i + 1}', int(v), emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = (ContinuousColumn(
        'input_continuous_all',
        [f'I{i + 1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)

    sample = {'cat': cat[:batch_size] % np.asarray(vocab_sizes),
              'input_continuous_all': dense[:batch_size]}
    model.build(sample_batch={k: v[:2] for k, v in sample.items()})
    model._place_on_mesh()
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
    batches = []
    for i in range(4):
        sl = slice(i * batch_size, (i + 1) * batch_size)
        b = {'cat': cat[sl] % np.asarray(vocab_sizes),
             'input_continuous_all': dense[sl]}
        bb, yb, _ = model._place_batch(b, y[sl])
        batches.append((bb, yb))

    params = model.variables['params']
    bstats = model.variables.get('batch_stats', {})
    rng = jax.random.PRNGKey(0)
    for i in range(5):
        b, yb = batches[i % 4]
        params, bstats, opt_state, loss = step(params, bstats, opt_state,
                                               b, yb, rng)
    jax.block_until_ready(loss)
    steps = 0
    t0 = time.perf_counter()
    while True:
        b, yb = batches[steps % 4]
        params, bstats, opt_state, loss = step(params, bstats, opt_state,
                                               b, yb, rng)
        steps += 1
        if steps % 10 == 0:
            jax.block_until_ready(loss)
            if time.perf_counter() - t0 >= bench_seconds:
                break
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0
    return steps * batch_size / elapsed


def main():
    import jax
    n = len(jax.devices())
    results = {}
    for d in [1, 2, 4, n] if n >= 4 else [1, n]:
        if d > n or d in results:
            continue
        eps = measure(d)
        results[d] = eps
        per_chip = eps / d
        eff = per_chip / (results[1] / 1) if 1 in results else 1.0
        print(json.dumps({
            'metric': 'weak_scaling', 'devices': d,
            'examples_per_sec': round(eps, 1),
            'per_device': round(per_chip, 1),
            'efficiency_vs_1dev': round(eff, 3)}))
    if n >= 2:
        eps = measure(n, sharded_tables=True)
        print(json.dumps({
            'metric': 'weak_scaling_sharded_tables', 'devices': n,
            'examples_per_sec': round(eps, 1)}))


if __name__ == '__main__':
    main()
