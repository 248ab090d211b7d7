# -*- coding:utf-8 -*-
"""Weak-scaling measurement over a device mesh, with a JSON artifact.

Target (BASELINE.md): ≥90% weak-scaling efficiency — per-chip throughput
with N data-parallel devices vs 1 device, with the global batch scaled by N.

On real multi-chip hardware this measures ICI collectives; in this
environment (one real chip) run it on the virtual CPU mesh to validate the
scaling *path* and to give the sharding code a regression trendline:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py

Writes ``benchmarks/scaling_results.json``: for each device count and
embedding strategy (replicated / sharded / sharded_a2a) the per-step time,
per-device throughput, efficiency vs 1 device, and the analytic per-step
collective traffic (bytes on the wire per device) implied by the sharding
layout.  Per-device efficiency on shared host cores is NOT a proxy for ICI
efficiency — the artifact records the path, not a hardware claim.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this benchmark NEEDS the virtual CPU mesh: the env-var JAX_PLATFORMS is
# ignored when the axon TPU plugin is present (it grabs the backend), so
# pin the platform through jax.config before any jax import elsewhere
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'scaling_results.json')


def collective_bytes_per_step(strategy, n_devices, model_parallel,
                              batch_size, n_fields, emb_dim, n_params,
                              dtype_bytes=4):
    """Analytic per-device wire bytes per train step for each layout.

    - data-parallel grad psum: ring all-reduce moves ~2*(S-1)/S * P bytes
      per device over the data axis (P = replicated param bytes).
    - 'sharded' lookup: XLA partitions the gather into broadcast-ids +
      masked local gather + psum of the (B_local, F, D) activation over the
      model axis, fwd + bwd.
    - 'sharded_a2a': id all_to_all + row all_to_all + output all_gather
      (fwd), mirrored in reverse for the backward.
    """
    data_parallel = n_devices // model_parallel
    out = {}
    p_bytes = n_params * dtype_bytes
    if data_parallel > 1:
        out['grad_allreduce'] = 2 * (data_parallel - 1) / data_parallel \
            * p_bytes
    b_local = batch_size // data_parallel
    act = b_local * n_fields * emb_dim * dtype_bytes
    if model_parallel > 1:
        if strategy == 'sharded':
            # psum of the full local activation over the model axis, fwd+bwd
            out['emb_psum'] = 2 * 2 * (model_parallel - 1) / model_parallel \
                * act
        elif strategy == 'sharded_a2a':
            ids = b_local * n_fields * 4  # int32 id requests
            stripe_rows = act / model_parallel
            # fwd: ids out + rows back + output all-gather of stripes;
            # bwd mirrors the row exchange
            out['a2a_ids'] = ids
            out['a2a_rows'] = 2 * stripe_rows * model_parallel
            out['out_allgather'] = (model_parallel - 1) * stripe_rows
    out['total'] = sum(out.values())
    return out


def measure(n_devices, per_device_batch=2048, bench_seconds=3.0,
            emb_dim=16, emb_strategy='replicated'):
    import jax
    import optax

    from deeptables_tpu.data.datasets import load_criteo_synthetic
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib
    from deeptables_tpu.parallel.mesh import (DataAndModelParallel,
                                              DataParallel, build_mesh)

    sharded = emb_strategy != 'replicated'
    model_parallel = 2 if sharded and n_devices % 2 == 0 else 1
    data_parallel = n_devices // model_parallel
    if sharded:
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
        embedding_device_strategy=emb_strategy,
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

    n_params = sum(int(np.prod(np.shape(p))) for p in
                   jax.tree_util.tree_leaves(params))
    return {
        'devices': n_devices,
        'strategy': emb_strategy,
        'mesh': f'{data_parallel}x{model_parallel}',
        'global_batch': batch_size,
        'examples_per_sec': round(steps * batch_size / elapsed, 1),
        'step_ms': round(elapsed / steps * 1e3, 3),
        'collective_bytes_per_step_per_device': {
            k: round(v) for k, v in collective_bytes_per_step(
                emb_strategy, n_devices, model_parallel, batch_size,
                len(cat_cols), emb_dim, n_params).items()},
    }


def main():
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # the tunneled TPU plugin overrides the env var; the config flag wins
        jax.config.update('jax_platforms', 'cpu')
    n = len(jax.devices())
    records = []
    base_per_dev = {}
    for emb_strategy in ['replicated', 'sharded', 'sharded_a2a']:
        for d in sorted({1, 2, 4, n}):
            if d > n:
                continue
            if emb_strategy != 'replicated' and d < 2:
                continue  # model axis needs >=2 devices
            rec = measure(d, emb_strategy=emb_strategy)
            per_dev = rec['examples_per_sec'] / d
            key = emb_strategy
            if key not in base_per_dev:
                base_per_dev[key] = per_dev
            rec['per_device'] = round(per_dev, 1)
            rec['efficiency_vs_smallest'] = round(
                per_dev / base_per_dev[key], 3)
            records.append(rec)
            print(json.dumps(rec), flush=True)
    with open(_OUT, 'w') as f:
        json.dump({
            'note': ('virtual CPU mesh when run without real multi-chip '
                     'hardware: validates the sharding path and gives a '
                     'regression trendline; NOT an ICI efficiency claim'),
            'records': records}, f, indent=1)
    print(f'wrote {_OUT}')


if __name__ == '__main__':
    main()
