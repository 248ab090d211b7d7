# -*- coding:utf-8 -*-
"""Loss functions.

Parity with the reference's custom losses (``deeptables/models/layers.py``:
BinaryFocalLoss 983, CategoricalFocalLoss 1025, GHMCLoss 1085) plus the
standard auto-selected losses (deepmodel.py:319-346).  All losses here are
pure functions over **logits** (numerically stabler than the reference's
proba-space formulation) with an optional per-sample weight vector, returning
a scalar mean loss.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _weighted_mean(values, sample_weight):
    if sample_weight is None:
        return jnp.mean(values)
    sample_weight = sample_weight.reshape(values.shape)
    return jnp.sum(values * sample_weight) / jnp.maximum(
        jnp.sum(sample_weight), _EPS)


def binary_crossentropy(logits, y_true, sample_weight=None):
    """Sigmoid BCE on logits; y_true (B,) or (B,1) in {0,1}."""
    logits = logits.reshape(-1)
    y = y_true.reshape(-1).astype(logits.dtype)
    per = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _weighted_mean(per, sample_weight)


def categorical_crossentropy(logits, y_true, sample_weight=None):
    """Softmax CE on logits; y_true int labels (B,) or one-hot (B, C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if y_true.ndim == 1 or (y_true.ndim == 2 and y_true.shape[-1] == 1):
        y_idx = y_true.reshape(-1).astype(jnp.int32)
        per = -jnp.take_along_axis(logp, y_idx[:, None], axis=-1).reshape(-1)
    else:
        per = -jnp.sum(y_true.astype(logp.dtype) * logp, axis=-1)
    return _weighted_mean(per, sample_weight)


def multilabel_binary_crossentropy(logits, y_true, sample_weight=None):
    """Per-class sigmoid BCE averaged over classes; y_true (B, C)."""
    y = y_true.astype(logits.dtype)
    per = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = jnp.mean(per, axis=-1)
    return _weighted_mean(per, sample_weight)


def mse(logits, y_true, sample_weight=None):
    per = jnp.square(logits.reshape(-1) - y_true.reshape(-1).astype(logits.dtype))
    return _weighted_mean(per, sample_weight)


def mae(logits, y_true, sample_weight=None):
    per = jnp.abs(logits.reshape(-1) - y_true.reshape(-1).astype(logits.dtype))
    return _weighted_mean(per, sample_weight)


def huber(logits, y_true, sample_weight=None, delta=1.0):
    err = logits.reshape(-1) - y_true.reshape(-1).astype(logits.dtype)
    abs_err = jnp.abs(err)
    per = jnp.where(abs_err <= delta, 0.5 * err * err,
                    delta * (abs_err - 0.5 * delta))
    return _weighted_mean(per, sample_weight)


def binary_focal_loss(gamma: float = 2., alpha: float = .25):
    """Binary focal loss (reference layers.py:983-1017).

    Matches the reference formulation: mean over positive-masked and
    negative-masked terms computed in probability space (clipped).
    """
    def loss(logits, y_true, sample_weight=None):
        p = jax.nn.sigmoid(logits.reshape(-1))
        y = y_true.reshape(-1).astype(p.dtype)
        pt_1 = jnp.where(y == 1, p, jnp.ones_like(p))
        pt_0 = jnp.where(y == 0, p, jnp.zeros_like(p))
        pt_1 = jnp.clip(pt_1, _EPS, 1. - _EPS)
        pt_0 = jnp.clip(pt_0, _EPS, 1. - _EPS)
        term1 = alpha * jnp.power(1. - pt_1, gamma) * jnp.log(pt_1)
        term0 = (1 - alpha) * jnp.power(pt_0, gamma) * jnp.log(1. - pt_0)
        if sample_weight is not None:
            w = sample_weight.reshape(-1)
            return -(jnp.sum(term1 * w) + jnp.sum(term0 * w)) / jnp.maximum(
                jnp.sum(w), _EPS)
        return -jnp.mean(term1) - jnp.mean(term0)
    loss.__name__ = 'binary_focal_loss'
    return loss


def categorical_focal_loss(gamma: float = 2., alpha: float = .25):
    """Softmax focal loss (reference layers.py:1025-1077)."""
    def loss(logits, y_true, sample_weight=None):
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.clip(p, _EPS, 1. - _EPS)
        if y_true.ndim == 1 or (y_true.ndim == 2 and y_true.shape[-1] == 1):
            y = jax.nn.one_hot(y_true.reshape(-1).astype(jnp.int32),
                               logits.shape[-1], dtype=p.dtype)
        else:
            y = y_true.astype(p.dtype)
        ce = -y * jnp.log(p)
        per = jnp.sum(alpha * jnp.power(1. - p, gamma) * ce, axis=1)
        return _weighted_mean(per, sample_weight)
    loss.__name__ = 'categorical_focal_loss'
    return loss


class GHMCLoss:
    """Gradient-Harmonizing-Mechanism classification loss
    (reference layers.py:1085-1163; default ``momentum=0.75`` there).

    Each sample is weighted by the inverse density of its gradient-norm
    bin.  With ``momentum > 0`` the bin counts are an EMA carried across
    steps — the reference keeps it in a hidden ``tf.Variable``; here it is
    an explicit functional state threaded through the train step:

    - ``init_state()`` → initial (bins,) count vector;
    - ``loss(logits, y, w, state=s)`` → ``(loss, new_state)``;
    - ``loss(logits, y, w)`` (no state, e.g. validation) falls back to
      per-batch counts without updating anything.
    """

    def __init__(self, bins: int = 10, momentum: float = 0.75):
        self.bins = bins
        self.momentum = momentum
        self.stateful = momentum > 0
        self.__name__ = 'ghmc_loss'
        self._edges_left = jnp.asarray([i / bins for i in range(bins)])
        er = jnp.asarray([(i + 1) / bins for i in range(bins)])
        self._edges_right = er.at[-1].add(1e-6)

    def init_state(self):
        return jnp.zeros((self.bins,), jnp.float32)

    def __call__(self, logits, y_true, sample_weight=None, state=None):
        logits2 = logits.reshape(logits.shape[0], -1)
        target = y_true.reshape(logits2.shape).astype(logits2.dtype)
        g = jnp.abs(jax.nn.sigmoid(logits2) - target)  # (B, C)
        inds = ((g[None] >= self._edges_left[:, None, None]) &
                (g[None] < self._edges_right[:, None, None])
                ).astype(logits2.dtype)
        tot = jnp.maximum(float(1) * logits2.shape[0] * logits2.shape[1], 1.0)
        num_in_bin = jnp.sum(inds, axis=(1, 2))  # (bins,)
        num_valid_bin = jnp.sum((num_in_bin > 0).astype(logits2.dtype))

        new_state = None
        if state is not None and self.momentum > 0:
            mmt = self.momentum
            new_state = jnp.where(num_in_bin > 0,
                                  mmt * state + (1 - mmt) * num_in_bin,
                                  state)
            denom = new_state.astype(logits2.dtype)
        else:
            denom = num_in_bin
        weights = jnp.where(inds == 1,
                            tot / jnp.maximum(denom, _EPS)[:, None, None],
                            0.0)
        weights = jnp.sum(weights, axis=0) / jnp.maximum(num_valid_bin, 1.0)
        # weight gradients are zero a.e. (pure indicator functions); cut the
        # AD graph explicitly so the backward pass skips them
        weights = jax.lax.stop_gradient(weights)
        per = jnp.maximum(logits2, 0) - logits2 * target + \
            jnp.log1p(jnp.exp(-jnp.abs(logits2)))
        loss = jnp.sum(per * weights) / tot
        if state is not None:
            return loss, (new_state if new_state is not None else state)
        return loss


def ghmc_loss(bins: int = 10, momentum: float = 0.0):
    """Factory form of :class:`GHMCLoss` (stateless by default)."""
    return GHMCLoss(bins=bins, momentum=momentum)


# keras-style aliases accepted in ModelConfig.loss
_LOSSES = {
    'binary_crossentropy': binary_crossentropy,
    'bce': binary_crossentropy,
    'categorical_crossentropy': categorical_crossentropy,
    'sparse_categorical_crossentropy': categorical_crossentropy,
    'cce': categorical_crossentropy,
    'mse': mse,
    'mean_squared_error': mse,
    'mae': mae,
    'mean_absolute_error': mae,
    'huber': huber,
}


def get_loss(identifier):
    """Resolve a loss name/callable to fn(logits, y_true, sample_weight)."""
    if callable(identifier):
        return identifier
    key = str(identifier).lower()
    if key not in _LOSSES:
        raise ValueError(f'Unknown loss: {identifier!r}')
    return _LOSSES[key]


def auto_loss_name(task, num_classes):
    """Auto loss selection mirroring reference deepmodel.py:325-340."""
    from ..utils import consts
    if task in (consts.TASK_BINARY,):
        return 'binary_crossentropy'
    if task == consts.TASK_MULTILABEL:
        return 'multilabel_binary_crossentropy'
    if task == consts.TASK_REGRESSION:
        return 'mse'
    if task == consts.TASK_MULTICLASS:
        # the reference picks BCE for 2-class softmax heads
        # (deepmodel.py:333-336); with one-hot targets the optimum is the
        # same, so the numerically-stable softmax CE is used for any C here.
        return 'categorical_crossentropy'
    raise RuntimeError(f'unseen task "{task}"')


_LOSSES['multilabel_binary_crossentropy'] = multilabel_binary_crossentropy
# custom-loss names accepted in ModelConfig.loss (reference users construct
# BinaryFocalLoss()/GHMCLoss() objects; strings also work here)
_LOSSES['binary_focal_loss'] = binary_focal_loss()
_LOSSES['categorical_focal_loss'] = categorical_focal_loss()
_LOSSES['ghmc'] = GHMCLoss(momentum=0.75)
_LOSSES['ghmc_loss'] = _LOSSES['ghmc']
