# -*- coding:utf-8 -*-
"""Numeric tests: each interaction block vs a plain-numpy oracle that
transcribes the reference layer math (deeptables/models/layers.py)."""

import itertools

import jax
import numpy as np
import pytest

from deeptables_tpu.ops import interactions as L

B, F, D = 8, 5, 4


@pytest.fixture(scope='module')
def x():
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, F, D)).astype(np.float32)


def init_and_apply(module, x, method=None):
    rng = jax.random.PRNGKey(0)
    variables = module.init({'params': rng, 'dropout': rng}, x, training=False)
    out = module.apply(variables, x, training=False)
    return variables, out


class TestFM:
    def test_oracle(self, x):
        _, out = init_and_apply(L.FM(), x)
        sq_sum = np.square(x.sum(axis=1))
        sum_sq = (x * x).sum(axis=1)
        expected = 0.5 * (sq_sum - sum_sq).sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
        assert out.shape == (B, 1)


class TestCross:
    def test_oracle(self, x):
        x2 = x.reshape(B, -1)
        module = L.Cross(params={'num_cross_layer': 3})
        variables, out = init_and_apply(module, x2)
        params = variables['params']
        # numpy oracle of x_{l+1} = x0 * (x_l @ w) + x_l + b
        xl = x2.copy()
        for i in range(3):
            w = np.asarray(params[f'kernels_{i}']).reshape(-1)
            b = np.asarray(params[f'bias_{i}']).reshape(-1)
            xl = x2 * (xl @ w)[:, None] + xl + b
        np.testing.assert_allclose(np.asarray(out), xl, rtol=1e-4)


class TestInnerProduct:
    def test_oracle(self, x):
        _, out = init_and_apply(L.InnerProduct(), x)
        pairs = list(itertools.combinations(range(F), 2))
        expected = np.stack(
            [(x[:, i, :] * x[:, j, :]).sum(-1) for i, j in pairs], axis=1)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
        assert out.shape == (B, len(pairs))


class TestOuterProduct:
    @pytest.mark.parametrize('kernel_type', ['mat', 'vec', 'num'])
    def test_oracle(self, x, kernel_type):
        module = L.OuterProduct(
            params={'outer_product_kernel_type': kernel_type})
        variables, out = init_and_apply(module, x)
        kernel = np.asarray(variables['params']['kernel'])
        pairs = list(itertools.combinations(range(F), 2))
        p = np.stack([x[:, i, :] for i, _ in pairs], axis=1)
        q = np.stack([x[:, j, :] for _, j in pairs], axis=1)
        if kernel_type == 'mat':
            # reference layers.py:557-574: kp = Σ_e' [Σ_e p_e K_{e,p,e'}] q_e'
            expected = np.einsum('bpe,epf,bpf->bp', p, kernel, q)
            np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)
        else:
            expected = (p * q * kernel[None]).sum(-1)
            np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)
        assert out.shape == (B, len(pairs))


class TestBilinear:
    @pytest.mark.parametrize('btype',
                             ['field_all', 'field_each', 'field_interaction'])
    def test_oracle(self, x, btype):
        module = L.BilinearInteraction(bilinear_type=btype)
        variables, out = init_and_apply(module, x)
        w = np.asarray(variables['params']['bilinear_weight'])
        pairs = list(itertools.combinations(range(F), 2))
        ps = []
        for k, (i, j) in enumerate(pairs):
            if btype == 'field_all':
                wij = w
            elif btype == 'field_each':
                wij = w[i]
            else:
                wij = w[k]
            ps.append((x[:, i, :] @ wij) * x[:, j, :])
        expected = np.stack(ps, axis=1)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)
        assert out.shape == (B, len(pairs), D)


class TestSENET:
    def test_oracle(self, x):
        module = L.SENET(pooling_op='mean', reduction_ratio=3)
        variables, out = init_and_apply(module, x)
        params = variables['params']
        z = x.mean(-1)
        relu = lambda a: np.maximum(a, 0)
        a1 = relu(z @ np.asarray(params['dense_att1']['kernel'])
                  + np.asarray(params['dense_att1']['bias']))
        a2 = relu(a1 @ np.asarray(params['dense_att2']['kernel'])
                  + np.asarray(params['dense_att2']['bias']))
        expected = x * a2[:, :, None]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


class TestCIN:
    def test_oracle_direct(self, x):
        """direct=True path: z_bld = Σ_{f,g} x0_bfd h_bgd W_lfg."""
        module = L.CIN(params={'cross_layer_size': (6, 4), 'direct': True,
                               'activation': 'relu', 'use_bias': False})
        variables, out = init_and_apply(module, x)
        params = variables['params']
        relu = lambda a: np.maximum(a, 0)
        hidden = x
        finals = []
        for i, ls in enumerate((6, 4)):
            w = np.asarray(params[f'f_{i}'])  # (L, F0, Fk)
            z = np.einsum('bfd,bgd,lfg->bld', x, hidden, w)
            z = relu(z)
            finals.append(z)
            hidden = z
        result = np.concatenate(finals, axis=1).sum(-1)
        dk = np.asarray(params['exFM_out']['kernel'])
        db = np.asarray(params['exFM_out']['bias'])
        expected = result @ dk + db
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-5)
        assert out.shape == (B, 1)

    def test_split_half_shapes(self, x):
        module = L.CIN(params={'cross_layer_size': (8, 4), 'direct': False})
        _, out = init_and_apply(module, x)
        assert out.shape == (B, 1)

    def test_reduce_d(self, x):
        module = L.CIN(params={'cross_layer_size': (8, 4), 'reduce_D': True})
        _, out = init_and_apply(module, x)
        assert out.shape == (B, 1)

    @pytest.mark.parametrize('extra', [{}, {'use_bias': True},
                                       {'direct': True},
                                       {'reduce_D': True}])
    def test_batch_minor_tower_matches_classic(self, x, extra):
        """The round-4 batch-minor CIN tower (cin_params layout=
        'batch_minor', jnp fallback on CPU) must equal the classic
        (B, F, D) tower — values and input gradients — with
        interchangeable parameters."""
        import jax.numpy as jnp
        base = {'cross_layer_size': (8, 4), 'activation': 'relu'}
        classic = L.CIN(params=dict(base, layout='batch_major', **extra))
        bm = L.CIN(params=dict(base, layout='batch_minor', **extra))
        rng = jax.random.PRNGKey(3)
        variables = classic.init({'params': rng}, x, training=False)

        def run(module, xv):
            out = module.apply(variables, xv, training=False)
            return jnp.sum(out * jnp.cos(out)), out

        (l1, o1), g1 = jax.value_and_grad(
            lambda xv: run(classic, xv), has_aux=True)(jnp.asarray(x))
        (l2, o2), g2 = jax.value_and_grad(
            lambda xv: run(bm, xv), has_aux=True)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-3, atol=1e-5)

    @pytest.mark.parametrize('formulation', ['assoc', 'bm'])
    def test_custom_vjp_matches_autodiff(self, x, formulation):
        """Every hand-written backward formulation (ops/cin_grad.py) must
        produce the same z/dx0/dh/dW as XLA autodiff of the einsum."""
        import jax.numpy as jnp
        from deeptables_tpu.ops.cin_grad import cin_contract

        rng = np.random.default_rng(1)
        L_, G = 6, 3
        x0 = jnp.asarray(x)
        h = jnp.asarray(rng.normal(size=(B, G, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(L_, F, G)).astype(np.float32))

        def loss(fn):
            def f(x0, h, w):
                z = fn(x0, h, w)
                # non-uniform cotangent so the backward is fully exercised
                return jnp.sum(z * jnp.sin(z))
            return f

        ref_val, ref_grads = jax.value_and_grad(
            loss(lambda a, b, c: cin_contract(a, b, c, 'auto')),
            argnums=(0, 1, 2))(x0, h, w)
        val, grads = jax.value_and_grad(
            loss(lambda a, b, c: cin_contract(a, b, c, formulation)),
            argnums=(0, 1, 2))(x0, h, w)
        np.testing.assert_allclose(val, ref_val, rtol=1e-5)
        for g, rg, name in zip(grads, ref_grads, ('dx0', 'dh', 'dw')):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(rg), rtol=1e-4, atol=1e-5,
                err_msg=f'{formulation}:{name}')

    @pytest.mark.parametrize('formulation', ['assoc', 'bm'])
    def test_custom_vjp_mixed_dtypes(self, x, formulation):
        """The bf16-policy model feeds bf16 x0 with an f32 h (previous
        layer's f32 activation): cotangents must come back in the primal
        dtypes (regression: the slice-transpose of the split-half path
        asserts this)."""
        import jax.numpy as jnp
        from deeptables_tpu.ops.cin_grad import cin_contract

        rng = np.random.default_rng(2)
        L_, G = 4, 3
        x0 = jnp.asarray(x, dtype=jnp.bfloat16)
        h = jnp.asarray(rng.normal(size=(B, G, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(L_, F, G)).astype(np.float32))

        def f(x0, h, w):
            z = cin_contract(x0, h, w, formulation)
            return jnp.sum(z * z)

        grads = jax.grad(f, argnums=(0, 1, 2))(x0, h, w)
        assert grads[0].dtype == jnp.bfloat16
        assert grads[1].dtype == jnp.float32
        assert grads[2].dtype == jnp.float32
        ref = jax.grad(
            lambda a, b, c: jnp.sum(cin_contract(a, b, c, 'auto') ** 2),
            argnums=(0, 1, 2))(x0, h, w)
        for g, rg in zip(grads, ref):
            np.testing.assert_allclose(
                np.asarray(g, dtype=np.float32),
                np.asarray(rg, dtype=np.float32), rtol=0.05, atol=0.05)

    def test_custom_vjp_rejects_unknown(self, x):
        from deeptables_tpu.ops.cin_grad import cin_contract
        import jax.numpy as jnp
        with pytest.raises(ValueError):
            cin_contract(jnp.asarray(x), jnp.asarray(x),
                         jnp.zeros((2, F, F)), 'nope')


class TestAFM:
    def test_shapes(self, x):
        module = L.AFM(params={'attention_factor': 4, 'dropout_rate': 0})
        _, out = init_and_apply(module, x)
        assert out.shape == (B, 1)


class TestMultiheadAttention:
    def test_shapes(self, x):
        module = L.MultiheadAttention(
            params={'num_heads': 2, 'dropout_rate': 0, 'use_residual': True})
        _, out = init_and_apply(module, x)
        assert out.shape == (B, F, D)

    def test_math_single_head_no_residual(self, x):
        module = L.MultiheadAttention(
            params={'num_heads': 1, 'dropout_rate': 0, 'use_residual': False})
        variables, out = init_and_apply(module, x)
        p = variables['params']
        relu = lambda a: np.maximum(a, 0)
        dense = lambda name, v: relu(
            v @ np.asarray(p[name]['kernel']) + np.asarray(p[name]['bias']))
        q, k, v = dense('dense_Q', x), dense('dense_K', x), dense('dense_V', x)
        w = np.einsum('bfd,bgd->bfg', q, k) / np.sqrt(D)
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = relu(np.einsum('bfg,bgd->bfd', w, v))
        # batch-norm in eval mode with fresh stats: (o - 0)/sqrt(1+eps)*γ+β
        expected = o / np.sqrt(1 + 1e-3)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-5)

    def test_batch_minor_matches_batch_major(self, x):
        """The TPU-friendly batch-minor layout (default) computes exactly
        the batch-major math, with interchangeable parameters."""
        base = {'num_heads': 2, 'dropout_rate': 0, 'use_residual': True}
        minor = L.MultiheadAttention(params=dict(base,
                                                 layout='batch_minor'))
        major = L.MultiheadAttention(params=dict(base,
                                                 layout='batch_major'))
        rng = jax.random.PRNGKey(7)
        variables = minor.init({'params': rng}, x, training=False)
        out_minor = minor.apply(variables, x, training=False)
        out_major = major.apply(variables, x, training=False)
        np.testing.assert_allclose(np.asarray(out_minor),
                                   np.asarray(out_major),
                                   rtol=1e-5, atol=1e-6)
        # training mode: batch stats updates must match too
        om, varm = minor.apply(variables, x, training=True,
                               mutable=['batch_stats'])
        oM, varM = major.apply(variables, x, training=True,
                               mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(om), np.asarray(oM),
                                   rtol=1e-5, atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            varm['batch_stats'], varM['batch_stats'])

    def test_batch_minor_matches_batch_major_bf16(self, x):
        """bf16 activations (the default dtype policy): the batch-minor
        fallback keeps the softmax weights f32 through the context
        contraction (ADVICE r3), so the layouts must agree to bf16
        tolerance."""
        import jax.numpy as jnp
        base = {'num_heads': 2, 'dropout_rate': 0, 'use_residual': True}
        minor = L.MultiheadAttention(params=dict(base,
                                                 layout='batch_minor'))
        major = L.MultiheadAttention(params=dict(base,
                                                 layout='batch_major'))
        xb = jnp.asarray(x, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(7)
        variables = minor.init({'params': rng}, xb, training=False)
        out_minor = minor.apply(variables, xb, training=False)
        out_major = major.apply(variables, xb, training=False)
        np.testing.assert_allclose(
            np.asarray(out_minor, dtype=np.float32),
            np.asarray(out_major, dtype=np.float32), rtol=0.06, atol=0.06)


class TestFGCNN:
    def test_shapes(self, x):
        module = L.FGCNN(filters=3, kernel_height=3, new_filters=2,
                         pool_height=2)
        rng = jax.random.PRNGKey(0)
        inp = x[..., None]
        variables = module.init({'params': rng}, inp, training=False)
        pooled, new = module.apply(variables, inp, training=False)
        assert pooled.shape == (B, (F + 1) // 2, D, 3)
        assert new.shape == (B, F * 2, D)
