# -*- coding:utf-8 -*-
"""Keras-compatible initializer name resolution for flax modules."""

import jax
import jax.numpy as jnp
from flax import linen as nn


def _random_uniform(minval=-0.05, maxval=0.05):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval, maxval)
    return init


_REGISTRY = {
    'uniform': _random_uniform(),
    'random_uniform': _random_uniform(),
    'normal': nn.initializers.normal(stddev=0.05),
    'random_normal': nn.initializers.normal(stddev=0.05),
    'glorot_uniform': nn.initializers.glorot_uniform(),
    'glorot_normal': nn.initializers.glorot_normal(),
    'he_uniform': nn.initializers.he_uniform(),
    'he_normal': nn.initializers.he_normal(),
    'lecun_uniform': nn.initializers.lecun_uniform(),
    'lecun_normal': nn.initializers.lecun_normal(),
    'zeros': nn.initializers.zeros,
    'ones': nn.initializers.ones,
}


def get_initializer(identifier, default='glorot_uniform'):
    """Resolve a keras-style initializer name (or callable) to a jax init fn."""
    if identifier is None:
        identifier = default
    if callable(identifier):
        return identifier
    key = str(identifier).lower()
    if key not in _REGISTRY:
        raise ValueError(f'Unknown initializer: {identifier!r}')
    return _REGISTRY[key]


def get_activation(identifier):
    """Resolve a keras-style activation name (or callable) to a jax fn."""
    if identifier is None:
        return lambda x: x
    if callable(identifier):
        return identifier
    key = str(identifier).lower()
    table = {
        'relu': jax.nn.relu,
        'tanh': jnp.tanh,
        'sigmoid': jax.nn.sigmoid,
        'gelu': jax.nn.gelu,
        'elu': jax.nn.elu,
        'selu': jax.nn.selu,
        'softmax': jax.nn.softmax,
        'swish': jax.nn.silu,
        'silu': jax.nn.silu,
        'linear': lambda x: x,
        'none': lambda x: x,
    }
    if key not in table:
        raise ValueError(f'Unknown activation: {identifier!r}')
    return table[key]
