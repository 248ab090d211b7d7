# -*- coding:utf-8 -*-
"""Ablation profiler for the AutoInt (avazu-style) train step — locates the
gap between the measured ~17 ms step and the ~1 ms hand floor
(BASELINE.md config 4).  Same scan-timing discipline as profile_step.py.

Variants: full step / forward / fwd+bwd / embedding path only /
attention tower only (embeddings replaced by a learned dense input of the
same shape, isolating the interaction blocks from the lookup).

Usage: python benchmarks/profile_autoint.py [batch_size]
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

    from deeptables_tpu.data.datasets import load_avazu_synthetic
    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import CategoricalColumn
    from deeptables_tpu.ops import losses as losses_lib

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(os.environ.get('PROF_STEPS', 64))
    emb_dim = 16
    n_batches = 8

    df = load_avazu_synthetic(batch_size * n_batches)
    y = df.pop('click').to_numpy(np.float32)
    cat = df.to_numpy(np.int64).astype(np.int32)
    vocab_sizes = cat.max(axis=0) + 1

    autoint_params = {'num_attention': 3, 'num_heads': 2,
                      'dropout_rate': 0, 'use_residual': True}
    config = ModelConfig(
        nets=['autoint_nets'], metrics=['AUC'], task='binary',
        embedding_dropout=0, embeddings_output_dim=emb_dim,
        autoint_params=autoint_params,
        dtype_policy='bfloat16', home_dir='/tmp/dt_bench')
    cat_cols = tuple(CategoricalColumn(f'C{i+1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    model = DeepModel('binary', 2, config, cat_cols, ())
    sample = {'cat': cat[:batch_size]}
    model.build(sample_batch=sample)
    module = model.module
    tx = optax.adam(1e-3)
    loss_fn = losses_lib.binary_crossentropy

    batches = ({'cat': jax.device_put(
        cat.reshape(n_batches, batch_size, -1))},
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

    def opt_only(carry, i):
        p, o = carry
        g = jax.tree_util.tree_map(lambda a: jnp.ones_like(a) * 1e-6, p)
        upd, no = tx.update(g, o, p)
        return (optax.apply_updates(p, upd), no), jnp.float32(0)

    record('adam_only', timed_scan(opt_only, (params0, opt0), steps))

    # --- embedding path only ---
    from deeptables_tpu.ops.embedding import MultiColumnEmbedding
    emb_mod = MultiColumnEmbedding(
        input_dims=tuple(int(v) + 1 for v in vocab_sizes),
        output_dims=tuple(emb_dim for _ in vocab_sizes))
    pe = emb_mod.init(jax.random.PRNGKey(0), sample['cat'])['params']
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

    # --- attention tower only: random (B,F,D) input, 3 blocks + head ---
    from deeptables_tpu.ops.interactions import MultiheadAttention
    import flax.linen as nn

    F = cat.shape[1]

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            for i in range(3):
                x = MultiheadAttention(params=autoint_params,
                                       name=f'att{i}')(x, training=training)
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(1)(x)[:, 0]

    tower = Tower()
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_batches, batch_size, F,
                                              emb_dim)).astype(np.float32),
        dtype=jnp.bfloat16)
    tv = tower.init(jax.random.PRNGKey(0), x0[0])
    pt, bt = tv['params'], tv.get('batch_stats', {})
    ot = jax.jit(tx.init)(pt)

    def tower_loss(p, bs, x, yb):
        out, mutated = tower.apply(
            {'params': p, 'batch_stats': bs}, x, training=True,
            mutable=['batch_stats'])
        return loss_fn(out, yb), mutated.get('batch_stats', {})

    def tower_step(carry, i):
        p, bs, o = carry
        (loss, nbs), grads = jax.value_and_grad(
            tower_loss, has_aux=True)(p, bs, x0[i], batches[1][i])
        upd, no = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), nbs, no), loss

    record('attention_tower_only', timed_scan(
        tower_step, (pt, bt, ot), steps))

    # --- tower variant ablations (candidate optimizations measured
    # before implementation; variants re-implement the batch-minor block
    # with pieces disabled/fused) ---
    from deeptables_tpu.ops.kernels.field_attention import field_attention

    class VariantAttention(nn.Module):
        no_bn: bool = False
        no_proj: bool = False
        fused_qkvr: bool = False
        use_kernel: bool = True

        @nn.compact
        def __call__(self, x, training=True):
            B, F_, U = x.shape
            H = autoint_params['num_heads']
            dh = U // H
            he = nn.initializers.he_uniform()
            if self.no_proj:
                q = k = v = r = x
            elif self.fused_qkvr:
                qkvr = jax.nn.relu(nn.Dense(4 * U, kernel_init=he,
                                            name='qkvr')(x))
                q, k, v, r = jnp.split(qkvr, 4, axis=-1)
            else:
                dn = lambda n: nn.Dense(U, kernel_init=he, name=n)
                q = jax.nn.relu(dn('dense_Q')(x))
                k = jax.nn.relu(dn('dense_K')(x))
                v = jax.nn.relu(dn('dense_V')(x))
                r = jax.nn.relu(dn('dense_residual')(x))
            split = lambda t: t.reshape(B, F_, H, dh).transpose(2, 1, 3, 0)
            qh, kh, vh = split(q), split(k), split(v)
            if self.use_kernel:
                o = field_attention(qh, kh, vh, 1.0 / (dh ** 0.5))
            else:
                w = jnp.sum(qh[:, :, None] * kh[:, None], axis=3,
                            dtype=jnp.float32) / (dh ** 0.5)
                w = jax.nn.softmax(w, axis=2)
                o = jnp.sum(w[:, :, :, None] * vh[:, None], axis=2,
                            dtype=jnp.float32)
            o = o.astype(x.dtype).transpose(3, 1, 0, 2).reshape(B, F_, U)
            o = jax.nn.relu(o + r)
            if not self.no_bn:
                o = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, epsilon=1e-3)(o)
            return o

    def variant_tower(**kw):
        class VT(nn.Module):
            @nn.compact
            def __call__(self, x, training=True):
                for i in range(3):
                    x = VariantAttention(name=f'att{i}', **kw)(
                        x, training=training)
                x = x.reshape(x.shape[0], -1)
                return nn.Dense(1)(x)[:, 0]
        return VT()

    for label, kw in [
            ('tower_variant_base', {}),
            ('tower_no_bn', {'no_bn': True}),
            ('tower_fused_qkvr', {'fused_qkvr': True}),
            ('tower_no_proj', {'no_proj': True}),
            ('tower_xla_attention', {'use_kernel': False})]:
        vt = variant_tower(**kw)
        tvv = vt.init(jax.random.PRNGKey(0), x0[0])
        pv, bv = tvv['params'], tvv.get('batch_stats', {})
        ov = jax.jit(tx.init)(pv)

        def v_loss(p, bs, x, yb, vt=vt):
            out, mutated = vt.apply(
                {'params': p, 'batch_stats': bs}, x, training=True,
                mutable=['batch_stats'])
            return loss_fn(out, yb), mutated.get('batch_stats', {})

        def v_step(carry, i, v_loss=v_loss):
            p, bs, o = carry
            (loss, nbs), grads = jax.value_and_grad(
                v_loss, has_aux=True)(p, bs, x0[i], batches[1][i])
            upd, no = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), nbs, no), loss

        record(label, timed_scan(v_step, (pv, bv, ov), steps))

    return results


if __name__ == '__main__':
    main()
