# -*- coding:utf-8 -*-
"""Fused field-attention kernel vs jnp oracle (interpret mode), forward
and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptables_tpu.ops.kernels.field_attention import (
    field_attention, field_attention_oracle)


@pytest.mark.parametrize('h,f,d,b', [(2, 22, 8, 256), (1, 7, 16, 128),
                                     (4, 10, 4, 384)])
def test_forward_matches_oracle(h, f, d, b):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(h, f, d, b)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / np.sqrt(d)
    out = field_attention(q, k, v, scale, True)
    ref = field_attention_oracle(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_oracle():
    h, f, d, b = 2, 9, 8, 256
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(h, f, d, b)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / np.sqrt(d)

    def loss_kernel(q, k, v):
        o = field_attention(q, k, v, scale, True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        o = field_attention_oracle(q, k, v, scale)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_bf16_inputs():
    h, f, d, b = 2, 5, 8, 128
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(h, f, d, b)), jnp.bfloat16)
               for _ in range(3))
    out = field_attention(q, k, v, 0.35355, True)
    ref = field_attention_oracle(q, k, v, 0.35355)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
