# -*- coding:utf-8 -*-
"""In-situ A/B of the embedding hot-path formulations (DT_EMB_KSEL ×
DT_EMB_SCATTER) on the DeepFM step.

Standalone micro-benchmarks mislead here: the elementwise k-select fuses
into its consumers (so its standalone ~290 µs mostly vanishes in-situ),
and the logical-row scatter's dim-minor buffer gets a padded layout once
embedded in the full backward.  This script measures what actually counts:
embedding fwd / fwd+bwd / full train step, one process per formulation
combo (the formulation is frozen into the jit trace).

Usage:
  python benchmarks/profile_emb_ab.py            # run all 4 combos
  python benchmarks/profile_emb_ab.py one        # run just the env-set combo
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one():
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.profile_step import timed_scan
    from deeptables_tpu.data.datasets import load_criteo_synthetic
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib
    from deeptables_tpu.ops.embedding import MultiColumnEmbedding

    batch_size = int(os.environ.get('AB_BATCH', 8192))
    steps = int(os.environ.get('PROF_STEPS', 128))
    emb_dim, n_batches = 16, 8
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * n_batches, return_arrays=True)

    config = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'], metrics=['AUC'],
        task='binary', embedding_dropout=0, embeddings_output_dim=emb_dim,
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

    out = {'ksel': os.environ.get('DT_EMB_KSEL', 'elementwise'),
           'scatter': os.environ.get('DT_EMB_SCATTER', 'lane')}

    def full(carry, i):
        p, bs, o = carry
        b, yb = pick(i)
        (loss, nbs), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(p, bs, b, yb)
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), nbs, no), loss

    out['full_step_ms'] = round(timed_scan(
        full, (params0, bstats0, opt0), steps) * 1e3, 3)

    emb_mod = MultiColumnEmbedding(
        input_dims=tuple(int(v) + 1 for v in vocab_sizes),
        output_dims=tuple(emb_dim for _ in vocab_sizes))
    pe = emb_mod.init(jax.random.PRNGKey(0),
                      cat[:batch_size].astype(np.int32))['params']

    def emb_loss(p, ids):
        o = emb_mod.apply({'params': p}, ids)
        return jnp.sum(o.stacked.astype(jnp.float32) ** 2) * 1e-6

    def emb_fwd(carry, i):
        p, acc = carry
        b, _ = pick(i)
        s = emb_loss(p, b['cat'])
        return (p, acc + s), s

    out['emb_fwd_ms'] = round(timed_scan(
        emb_fwd, (pe, jnp.float32(0)), steps) * 1e3, 3)

    gacc = jax.tree_util.tree_map(jnp.zeros_like, pe)

    def emb_fwd_bwd(carry, i):
        p, ga = carry
        b, _ = pick(i)
        loss, grads = jax.value_and_grad(emb_loss)(p, b['cat'])
        ga = jax.tree_util.tree_map(lambda a, g: a + g, ga, grads)
        return (p, ga), loss

    out['emb_fwd_bwd_ms'] = round(timed_scan(
        emb_fwd_bwd, (pe, gacc), steps) * 1e3, 3)
    print('AB_RESULT ' + json.dumps(out), flush=True)


def main():
    combos = [('elementwise', 'lane'), ('elementwise', 'logical'),
              ('matmul', 'lane'), ('matmul', 'logical'),
              ('elementwise', 'segsum')]  # round-4: sorted segment-sum
    if os.environ.get('AB_COMBOS'):  # e.g. "elementwise:segsum,..."
        combos = [tuple(c.split(':'))
                  for c in os.environ['AB_COMBOS'].split(',')]
    for ksel, scat in combos:
        env = dict(os.environ, DT_EMB_KSEL=ksel, DT_EMB_SCATTER=scat)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), 'one'],
            env=env, capture_output=True, text=True, timeout=1200)
        for line in r.stdout.splitlines():
            if line.startswith('AB_RESULT'):
                print(line, flush=True)
                break
        else:
            print(f'combo {ksel}/{scat} FAILED:', r.stderr[-400:],
                  flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'one':
        run_one()
    else:
        main()
