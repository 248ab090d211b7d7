# -*- coding:utf-8 -*-
"""In-situ A/B of the CIN backward formulations (ops/cin_grad.py).

Measures the FULL xDeepFM train step (fwd+bwd+Adam, donated scan chunks —
the only decision metric this repo trusts, BASELINE.md "Formulation A/B")
for each formulation in {auto, assoc, bm}, in one process (distinct jit
traces per variant).  Round-3 baseline: 9.98 ms/step (820k ex/s), of which
the autodiff CIN backward is ~8.1 ms.

Usage: python benchmarks/profile_cin_bwd.py [batch_size]
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
    variants = os.environ.get('PROF_VARIANTS', 'auto,assoc,bm').split(',')
    emb_dim, n_batches = 16, 8
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * n_batches, return_arrays=True)

    cat_cols = tuple(CategoricalColumn(f'C{i+1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = (ContinuousColumn(
        'input_continuous_all', [f'I{i+1}' for i in range(dense.shape[1])]),)
    tx = optax.adam(1e-3)
    loss_fn = losses_lib.binary_crossentropy
    rng = jax.random.PRNGKey(0)
    batches = ({'cat': jax.device_put(
        cat.reshape(n_batches, batch_size, -1)),
        'input_continuous_all': jax.device_put(
            dense.reshape(n_batches, batch_size, -1))},
        jax.device_put(y.reshape(n_batches, batch_size)))

    def pick(i):
        b = jax.tree_util.tree_map(lambda a: a[i], batches[0])
        return b, batches[1][i]

    for bwd in variants:
        bwd = bwd.strip()
        if bwd == 'tower':
            # round-4 default: full batch-minor tower (fused fwd+bwd)
            cin_params = {'cross_layer_size': (128, 128),
                          'activation': 'relu'}
        else:
            # classic (B, F, D) tower with the selected backward
            cin_params = {'cross_layer_size': (128, 128),
                          'activation': 'relu',
                          'layout': 'batch_major', 'bwd': bwd}
        config = ModelConfig(
            nets=['linear', 'cin_nets', 'dnn_nets'], metrics=['AUC'],
            task='binary', embedding_dropout=0,
            embeddings_output_dim=emb_dim, cin_params=cin_params,
            dnn_params={'hidden_units': ((1024, 0, False), (512, 0, False)),
                        'activation': 'relu'},
            dtype_policy='bfloat16', home_dir='/tmp/dt_bench')
        model = DeepModel('binary', 2, config, cat_cols, cont_cols)
        model.build(sample_batch={'cat': cat[:2],
                                  'input_continuous_all': dense[:2]})
        module = model.module
        params0 = model.variables['params']
        bstats0 = model.variables.get('batch_stats', {})
        opt0 = jax.jit(tx.init)(params0)

        def forward_loss(p, bs, b, yb):
            (logits, _), mutated = module.apply(
                {'params': p, 'batch_stats': bs}, b, training=True,
                rngs={'dropout': rng}, mutable=['batch_stats'])
            return loss_fn(logits, yb), mutated.get('batch_stats', {})

        def full(carry, i):
            p, bs, o = carry
            b, yb = pick(i)
            (loss, nbs), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(p, bs, b, yb)
            upd, no = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), nbs, no), loss

        v = timed_scan(full, (params0, bstats0, opt0), steps)
        print(f'full_step[bwd={bwd:6s}] {v*1e3:8.3f} ms/step   '
              f'{batch_size/v/1e6:8.2f} M examples/s', flush=True)

        if os.environ.get('PROF_ABLATE', '0') == '1':
            def fwd_only(carry, i):
                p, bs, acc = carry
                b, yb = pick(i)
                loss, nbs = forward_loss(p, bs, b, yb)
                return (p, nbs, acc + loss), loss

            va = timed_scan(fwd_only, (params0, bstats0, jnp.float32(0)),
                            steps)
            print(f'forward  [bwd={bwd:6s}] {va*1e3:8.3f} ms/step',
                  flush=True)

            gacc0 = jax.tree_util.tree_map(jnp.zeros_like, params0)

            def fwd_bwd(carry, i):
                p, bs, gacc = carry
                b, yb = pick(i)
                (loss, nbs), grads = jax.value_and_grad(
                    forward_loss, has_aux=True)(p, bs, b, yb)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads)
                return (p, nbs, gacc), loss

            vb = timed_scan(fwd_bwd, (params0, bstats0, gacc0), steps)
            print(f'fwd_bwd  [bwd={bwd:6s}] {vb*1e3:8.3f} ms/step',
                  flush=True)


if __name__ == '__main__':
    main()
