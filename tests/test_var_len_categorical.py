# -*- coding:utf-8 -*-
"""Var-len categorical (movielens genres) — mirrors reference
var_len_categorical_test.py."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_movielens
from deeptables_tpu.models import DeepTable, ModelConfig


@pytest.mark.parametrize('pooling', ['max', 'avg', 'flat'])
def test_movielens_genres(pooling):
    df = load_movielens(800)
    y = df.pop('rating')
    df = df.drop(columns=['title', 'timestamp'])
    conf = ModelConfig(
        nets=['dnn_nets'], task='regression', metrics=['mse'],
        var_len_categorical_columns=[('genres', '|', pooling)],
        embedding_dropout=0)
    dt = DeepTable(config=conf)
    _, history = dt.fit(df, y, epochs=1, verbose=0)
    assert dt.preprocessor.var_len_categorical_columns[0] \
        .max_elements_length >= 1
    pred = dt.predict(df.head(50))
    assert pred.shape[0] == 50
    assert np.isfinite(np.asarray(pred, dtype=float)).all()


def test_var_len_unseen_token():
    df = load_movielens(400)
    y = df.pop('rating')
    df = df.drop(columns=['title', 'timestamp'])
    conf = ModelConfig(
        nets=['dnn_nets'], task='regression', metrics=['mse'],
        var_len_categorical_columns=[('genres', '|', 'max')])
    dt = DeepTable(config=conf)
    dt.fit(df, y, epochs=1, verbose=0)
    df2 = df.head(10).copy()
    df2.loc[:, 'genres'] = 'UnknownGenre|Drama'
    pred = dt.predict(df2)
    assert np.isfinite(np.asarray(pred, dtype=float)).all()
