# -*- coding:utf-8 -*-
"""Ablation profiler for the xDeepFM (CIN 128x128) train step — locates
the gap between the 9.98 ms measured step and the 1.45 ms MXU floor.

Variants: full step / forward / fwd+bwd / embedding-only / CIN-tower-only
(CIN blocks on a learned dense input, isolating the interaction from the
lookup) / CIN-forward-only.

Usage: python benchmarks/profile_xdeepfm.py [batch_size]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_step import timed_scan  # noqa: E402


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

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(os.environ.get('PROF_STEPS', 64))
    emb_dim, n_batches = 16, 8
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * n_batches, return_arrays=True)

    cin_params = {'cross_layer_size': (128, 128), 'activation': 'relu'}
    config = ModelConfig(
        nets=['linear', 'cin_nets', 'dnn_nets'], metrics=['AUC'],
        task='binary', embedding_dropout=0, embeddings_output_dim=emb_dim,
        cin_params=cin_params,
        dnn_params={'hidden_units': ((1024, 0, False), (512, 0, False)),
                    'activation': 'relu'},
        dtype_policy='bfloat16', home_dir='/tmp/dt_bench')
    cat_cols = tuple(CategoricalColumn(f'C{i+1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = (ContinuousColumn(
        'input_continuous_all', [f'I{i+1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)
    model.build(sample_batch={'cat': cat[:2],
                              'input_continuous_all': dense[:2]})
    module = model.module
    tx = optax.adam(1e-3)
    loss_fn = losses_lib.binary_crossentropy

    batches = ({'cat': jax.device_put(
        cat.reshape(n_batches, batch_size, -1)),
        'input_continuous_all': jax.device_put(
            dense.reshape(n_batches, batch_size, -1))},
        jax.device_put(y.reshape(n_batches, batch_size)))
    params0 = model.variables['params']
    bstats0 = model.variables.get('batch_stats', {})
    opt0 = jax.jit(tx.init)(params0)
    rng = jax.random.PRNGKey(0)

    def pick(i):
        b = jax.tree_util.tree_map(lambda a: a[i], batches[0])
        return b, batches[1][i]

    def forward_loss(p, bs, b, yb):
        (logits, _), mutated = module.apply(
            {'params': p, 'batch_stats': bs}, b, training=True,
            rngs={'dropout': rng}, mutable=['batch_stats'])
        return loss_fn(logits, yb), mutated.get('batch_stats', {})

    def record(name, v):
        print(f'{name:28s} {v*1e3:8.3f} ms/step   '
              f'{batch_size/v/1e6:8.2f} M examples/s', flush=True)

    def full(carry, i):
        p, bs, o = carry
        b, yb = pick(i)
        (loss, nbs), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(p, bs, b, yb)
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), nbs, no), loss

    record('full_step', timed_scan(full, (params0, bstats0, opt0), steps))

    def fwd_only(carry, i):
        p, bs, acc = carry
        b, yb = pick(i)
        loss, nbs = forward_loss(p, bs, b, yb)
        return (p, nbs, acc + loss), loss

    record('forward', timed_scan(
        fwd_only, (params0, bstats0, jnp.float32(0)), steps))

    gacc0 = jax.tree_util.tree_map(jnp.zeros_like, params0)

    def fwd_bwd(carry, i):
        p, bs, gacc = carry
        b, yb = pick(i)
        (loss, nbs), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(p, bs, b, yb)
        gacc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), gacc, grads)
        return (p, nbs, gacc), loss

    record('forward_backward', timed_scan(
        fwd_bwd, (params0, bstats0, gacc0), steps))

    # --- CIN tower only on a fixed (B, F, D) input ---
    from deeptables_tpu.ops.interactions import CIN
    import flax.linen as nn

    F = cat.shape[1]

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            z = CIN(params=cin_params)(x, training=training)
            return nn.Dense(1)(z)[:, 0]

    tower = Tower()
    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(n_batches, batch_size, F, emb_dim)).astype(np.float32),
        dtype=jnp.bfloat16)
    tv = tower.init(jax.random.PRNGKey(0), x0[0])
    pt = tv['params']
    ot = jax.jit(tx.init)(pt)

    def tower_loss(p, x, yb):
        out = tower.apply({'params': p}, x, training=True)
        return loss_fn(out, yb)

    def tower_step(carry, i):
        p, o = carry
        loss, grads = jax.value_and_grad(tower_loss)(p, x0[i], batches[1][i])
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), no), loss

    record('cin_tower_only', timed_scan(tower_step, (pt, ot), steps))

    def tower_fwd(carry, i):
        p, acc = carry
        loss = tower_loss(p, x0[i], batches[1][i])
        return (p, acc + loss), loss

    record('cin_tower_forward', timed_scan(
        tower_fwd, (pt, jnp.float32(0)), steps))


if __name__ == '__main__':
    main()
