# -*- coding:utf-8 -*-
"""Embedding weight/activity regularizers have an observable effect
(parity: reference layers.py:834-851 applies them inside
MultiColumnEmbedding)."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.ops import regularizers


def test_get_regularizer_math():
    w = np.array([[1.0, -2.0], [3.0, 0.5]], np.float32)
    l1 = regularizers.get_regularizer(('l1', 0.1))
    l2 = regularizers.get_regularizer(('l2', 0.1))
    both = regularizers.get_regularizer({'l1': 0.1, 'l2': 0.2})
    np.testing.assert_allclose(float(l1(w)), 0.1 * 6.5, rtol=1e-6)
    np.testing.assert_allclose(float(l2(w)), 0.1 * 14.25, rtol=1e-6)
    np.testing.assert_allclose(float(both(w)), 0.1 * 6.5 + 0.2 * 14.25,
                               rtol=1e-6)
    assert regularizers.get_regularizer(None) is None
    assert regularizers.get_regularizer('l2') is not None
    with pytest.raises(ValueError):
        regularizers.get_regularizer('weird')
    with pytest.raises(ValueError):
        regularizers.get_regularizer({'l3': 0.1})


def _fit(df, y, **cfg_kw):
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       fixed_embedding_dim=True, embeddings_output_dim=4,
                       earlystopping_patience=0, embedding_dropout=0,
                       **cfg_kw)
    dt = DeepTable(config=conf)
    _, history = dt.fit(df, y, epochs=1, batch_size=128, verbose=0)
    return history.history['loss'][-1]


def test_embedding_regularizers_affect_loss():
    df = load_bank(400)
    y = df.pop('y')
    base = _fit(df.copy(), y)
    with_w = _fit(df.copy(), y, embeddings_regularizer=('l2', 1.0))
    with_a = _fit(df.copy(), y,
                  embeddings_activity_regularizer=('l2', 1.0))
    # the penalty is positive, so the regularized training loss must exceed
    # the unregularized one on the same data/seed
    assert with_w > base
    assert with_a > base
