# -*- coding:utf-8 -*-
"""Denoising auto-encoder for feature extraction.

Capability parity with the reference's ``fe/dae.py`` (DAE at 16: symmetric
encoder stack → ``feature_layer`` bottleneck → decoder, swap-noise mix
generator at 123, early stopping + LR reduction on plateau, fit_transform
returning bottleneck features) — implemented as a flax module with a jitted
train step.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..ops.initializers import get_activation, get_initializer
from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)


class _DAEModule(nn.Module):
    input_dim: int
    encoder_units: Tuple[int, ...]
    feature_units: int
    activation: str = 'relu'
    kernel_initializer: str = 'glorot_uniform'

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        init = get_initializer(self.kernel_initializer)
        n_stacks = len(self.encoder_units) - 1
        for i in range(n_stacks):
            x = act(nn.Dense(self.encoder_units[i + 1], kernel_init=init,
                             name=f'encoder_{i}')(x))
        feature = nn.Dense(self.feature_units, kernel_init=init,
                           name='feature_layer')(x)
        x = feature
        for i in range(n_stacks, 0, -1):
            x = act(nn.Dense(self.encoder_units[i], kernel_init=init,
                             name=f'decoder_{i}')(x))
        out = act(nn.Dense(self.input_dim, kernel_init=init,
                           name='output_layer')(x))
        return out, feature


class DAE:
    def __init__(self, encoder_units=(500, 500), feature_units=20,
                 activation='relu', kernel_initializer='glorot_uniform',
                 optimizer=None, noise_rate=0, learning_rate=0.001,
                 seed=9527):
        self.encoder_units = tuple(encoder_units)
        self.feature_units = feature_units
        self.activation = activation
        self.kernel_initializer = kernel_initializer
        self.learning_rate = learning_rate
        self.optimizer = optimizer
        self.noise_rate = noise_rate
        self.seed = seed
        self.module = None
        self.variables = None

    def _build(self, input_dim):
        self.module = _DAEModule(
            input_dim=input_dim, encoder_units=self.encoder_units,
            feature_units=self.feature_units, activation=self.activation,
            kernel_initializer=self.kernel_initializer)

    def _swap_noise(self, X, rng):
        """Swap-noise: replace a fraction of each row's values with the same
        column's values from another random row (reference dae.py:123-140)."""
        n, d = X.shape
        num_swap = int(d * self.noise_rate)
        if num_swap <= 0:
            return X
        out = X.copy()
        donor = X[rng.integers(0, n, n)]
        for i in range(n):
            idx = rng.choice(d, num_swap, replace=False)
            out[i, idx] = donor[i, idx]
        return out

    def fit(self, X, batch_size=128, epochs=1000, patience=5,
            lr_patience=3, min_delta=0.001, verbose=1):
        X = np.asarray(X, dtype=np.float32)
        n, d = X.shape
        self._build(d)
        rng_np = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed)
        self.variables = self.module.init(key, X[:2])

        lr = self.learning_rate
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
        opt_state = tx.init(self.variables['params'])

        @jax.jit
        def train_step(params, opt_state, x_noisy, x_clean):
            def loss_fn(p):
                recon, _ = self.module.apply({'params': p}, x_noisy)
                return jnp.mean((recon - x_clean) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        params = self.variables['params']
        best = np.inf
        best_params = params
        wait = 0
        lr_wait = 0
        steps = max(n // batch_size, 1)
        for epoch in range(epochs):
            perm = rng_np.permutation(n)
            losses = []
            for s in range(steps):
                sel = perm[s * batch_size:(s + 1) * batch_size]
                clean = X[sel]
                noisy = self._swap_noise(clean, rng_np) \
                    if self.noise_rate > 0 else clean
                params, opt_state, loss = train_step(params, opt_state,
                                                     noisy, clean)
                losses.append(loss)
            mse = float(np.mean(jax.device_get(losses)))
            if verbose and (epoch % 10 == 0 or epoch == epochs - 1):
                logger.info(f'DAE epoch {epoch}: mse={mse:.5f}')
            if mse < best - min_delta:
                best = mse
                best_params = jax.tree_util.tree_map(
                    lambda a: jnp.array(a, copy=True), params)
                wait = 0
                lr_wait = 0
            else:
                wait += 1
                lr_wait += 1
                if lr_wait >= lr_patience:
                    lr = max(lr * 0.5, 1e-6)
                    opt_state.hyperparams['learning_rate'] = lr
                    lr_wait = 0
                    if verbose:
                        logger.info(f'DAE: reduce lr to {lr}')
                if wait >= patience:
                    if verbose:
                        logger.info(f'DAE: early stop at epoch {epoch}')
                    break
        self.variables = {'params': best_params}
        return self

    def transform(self, X, batch_size=128):
        X = np.asarray(X, dtype=np.float32)

        @jax.jit
        def feat(variables, x):
            _, feature = self.module.apply(variables, x)
            return feature

        outs = []
        for s in range(0, len(X), batch_size):
            outs.append(np.asarray(feat(self.variables, X[s:s + batch_size])))
        return np.concatenate(outs)

    def fit_transform(self, X, batch_size=128, epochs=1000, **kwargs):
        self.fit(X, batch_size=batch_size, epochs=epochs, **kwargs)
        return self.transform(X, batch_size=batch_size)
