# -*- coding:utf-8 -*-
"""Ablation profiler for the DeepFM train step.

The tunneled TPU platform does not expose xplane traces, so hotspots are
located by ablation: time scan-chunked variants of the step (full /
forward-only / forward+backward / embedding-path-only / dense-path-only /
optimizer-only) and read the deltas.  Same measurement discipline as
bench.py: one long `lax.scan` per dispatch, pipelined host fetches.

Usage: python benchmarks/profile_step.py [batch_size]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(step_fn, carry, xs_steps, n_warm=1, n_rounds=3):
    """Per-step seconds of `step_fn(carry, x) -> (carry, out)` over a scan."""
    import jax
    import jax.numpy as jnp

    # donation consumes the carry; hand it a private copy so callers can
    # keep reusing the model's variables across ablation variants
    carry = jax.tree_util.tree_map(jnp.copy, carry)

    def chunk(carry):
        idx = np.arange(xs_steps, dtype=np.int32) % 8
        return jax.lax.scan(step_fn, carry, idx)

    chunk_j = jax.jit(chunk, donate_argnums=(0,))
    for _ in range(n_warm):
        carry, out = chunk_j(carry)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    t0 = time.perf_counter()
    prev = None
    for _ in range(n_rounds):
        carry, out = chunk_j(carry)
        if prev is not None:
            np.asarray(jax.tree_util.tree_leaves(prev)[0])
        prev = out
    np.asarray(jax.tree_util.tree_leaves(prev)[0])
    dt = (time.perf_counter() - t0) / (n_rounds * xs_steps)
    return dt


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
    steps = int(os.environ.get('PROF_STEPS', 128))
    emb_dim = 16
    n_batches = 8

    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * n_batches, return_arrays=True)

    config = ModelConfig(
        nets=['linear', 'fm_nets', 'dnn_nets'],
        metrics=['AUC'], task='binary', embedding_dropout=0,
        embeddings_output_dim=emb_dim,
        dnn_params={'hidden_units': ((1024, 0, False), (512, 0, False)),
                    'activation': 'relu'},
        dtype_policy='bfloat16', home_dir='/tmp/dt_bench')
    cat_cols = tuple(CategoricalColumn(f'C{i+1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = (ContinuousColumn('input_continuous_all',
                                  [f'I{i+1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)
    sample = {'cat': cat[:batch_size], 'input_continuous_all': dense[:batch_size]}
    model.build(sample_batch=sample)
    module = model.module
    tx = optax.adam(1e-3)
    loss_fn = losses_lib.binary_crossentropy

    batches = ({'cat': jax.device_put(cat.reshape(n_batches, batch_size, -1)),
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

    results = {}

    def record(name, v):
        results[name] = v
        print(f'{name:28s} {v*1e3:8.3f} ms/step   '
              f'{batch_size/v/1e6:8.2f} M examples/s', flush=True)

    # --- full step ---
    def full(carry, i):
        p, bs, o = carry
        b, yb = pick(i)
        (loss, nbs), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(p, bs, b, yb)
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), nbs, no), loss

    record('full_step', timed_scan(full, (params0, bstats0, opt0), steps))

    # --- forward only (carry a scalar so the scan isn't dead-code) ---
    p1, b1 = params0, bstats0

    def fwd_only(carry, i):
        p, bs, acc = carry
        b, yb = pick(i)
        loss, nbs = forward_loss(p, bs, b, yb)
        return (p, nbs, acc + loss), loss

    record('forward', timed_scan(fwd_only, (p1, b1, jnp.float32(0)), steps))

    # --- forward+backward, no optimizer (sum grads into carry) ---
    p2, b2 = params0, bstats0
    gacc0 = jax.tree_util.tree_map(jnp.zeros_like, p2)

    def fwd_bwd(carry, i):
        p, bs, gacc = carry
        b, yb = pick(i)
        (loss, nbs), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(p, bs, b, yb)
        gacc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), gacc, grads)
        return (p, nbs, gacc), loss

    record('forward_backward', timed_scan(fwd_bwd, (p2, b2, gacc0), steps))

    # --- optimizer only (adam over same param tree, fixed grads) ---
    p3 = params0
    g3 = jax.tree_util.tree_map(lambda a: jnp.ones_like(a) * 1e-6, p3)
    o3 = jax.jit(tx.init)(p3)

    def opt_only(carry, i):
        p, o = carry
        upd, no = tx.update(g3, o, p)
        return (optax.apply_updates(p, upd), no), jnp.float32(0)

    record('adam_only', timed_scan(opt_only, (p3, o3), steps))

    # --- embedding path only: lookup -> mean -> scalar loss ---
    from deeptables_tpu.ops.embedding import MultiColumnEmbedding
    emb_mod = MultiColumnEmbedding(
        input_dims=tuple(int(v) + 1 for v in vocab_sizes),
        output_dims=tuple(emb_dim for _ in vocab_sizes))
    emb_vars = emb_mod.init(jax.random.PRNGKey(0),
                            sample['cat'].astype(np.int32))
    pe = emb_vars['params']
    oe = jax.jit(tx.init)(pe)

    def emb_loss(p, ids):
        out = emb_mod.apply({'params': p}, ids)
        return jnp.sum(out.stacked.astype(jnp.float32) ** 2) * 1e-6

    def emb_step(carry, i):
        p, o = carry
        b, _ = pick(i)
        loss, grads = jax.value_and_grad(emb_loss)(p, b['cat'])
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), no), loss

    record('embedding_fwd_bwd_adam', timed_scan(emb_step, (pe, oe), steps))

    if os.environ.get('PROF_EMB', '1') == '1':
        # --- embedding sub-ablation ---
        def emb_fwd_step(carry, i):
            p, acc = carry
            b, _ = pick(i)
            out = emb_mod.apply({'params': p}, b['cat'])
            s = jnp.sum(out.stacked.astype(jnp.float32) ** 2) * 1e-6
            return (p, acc + s), s

        record('embedding_fwd', timed_scan(
            emb_fwd_step, (pe, jnp.float32(0)), steps))

        gacc_e = jax.tree_util.tree_map(jnp.zeros_like, pe)

        def emb_fwd_bwd(carry, i):
            p, gacc = carry
            b, _ = pick(i)
            loss, grads = jax.value_and_grad(emb_loss)(p, b['cat'])
            gacc = jax.tree_util.tree_map(lambda a, g: a + g, gacc, grads)
            return (p, gacc), loss

        record('embedding_fwd_bwd', timed_scan(
            emb_fwd_bwd, (pe, gacc_e), steps))

        # all-scatter gradient (kernel disabled)
        emb_sc = MultiColumnEmbedding(
            input_dims=tuple(int(v) + 1 for v in vocab_sizes),
            output_dims=tuple(emb_dim for _ in vocab_sizes),
            use_grad_kernel=False)
        ps = emb_sc.init(jax.random.PRNGKey(0),
                         sample['cat'].astype(np.int32))['params']
        gacc_s = jax.tree_util.tree_map(jnp.zeros_like, ps)

        def emb_loss_sc(p, ids):
            out = emb_sc.apply({'params': p}, ids)
            return jnp.sum(out.stacked.astype(jnp.float32) ** 2) * 1e-6

        def emb_fwd_bwd_sc(carry, i):
            p, gacc = carry
            b, _ = pick(i)
            loss, grads = jax.value_and_grad(emb_loss_sc)(p, b['cat'])
            gacc = jax.tree_util.tree_map(lambda a, g: a + g, gacc, grads)
            return (p, gacc), loss

        record('embedding_fwd_bwd_scatter', timed_scan(
            emb_fwd_bwd_sc, (ps, gacc_s), steps))

        # adam over the table tree only
        oe2 = jax.jit(tx.init)(pe)
        ge = jax.tree_util.tree_map(lambda a: jnp.ones_like(a) * 1e-6, pe)

        def emb_adam_only(carry, i):
            p, o = carry
            upd, no = tx.update(ge, o, p)
            return (optax.apply_updates(p, upd), no), jnp.float32(0)

        record('embedding_adam_only', timed_scan(
            emb_adam_only, (pe, oe2), steps))


if __name__ == '__main__':
    main()
