# -*- coding:utf-8 -*-
"""Callbacks: user ModelCheckpoint coexists with the injected EarlyStopping
(mirrors reference deeptable_callback_test.py)."""

import glob
import os

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import (DeepTable, EarlyStopping, ModelCheckpoint,
                                   ModelConfig)


def test_model_checkpoint_per_epoch(tmp_path):
    df = load_bank(400)
    y = df.pop('y')
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       earlystopping_patience=5, embedding_dropout=0)
    dt = DeepTable(config=conf)
    mcp = ModelCheckpoint(str(tmp_path / 'model-{epoch:02d}.dt'),
                          monitor='val_auc')
    _, history = dt.fit(df, y, epochs=3, verbose=0, callbacks=[mcp])
    files = sorted(glob.glob(str(tmp_path / 'model-*.dt')))
    assert len(files) == len(history.epoch)


def test_early_stopping_restores_best(tmp_path):
    df = load_bank(500)
    y = df.pop('y')
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       earlystopping_patience=1, embedding_dropout=0)
    dt = DeepTable(config=conf)
    _, history = dt.fit(df, y, epochs=8, verbose=0)
    # patience=1: training stops at most 1 epoch after the best one
    assert len(history.epoch) <= 8


def test_user_early_stopping_wins():
    df = load_bank(400)
    y = df.pop('y')
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       earlystopping_patience=1)
    dt = DeepTable(config=conf)
    user_es = EarlyStopping(monitor='val_auc', patience=99, mode='max')
    _, history = dt.fit(df, y, epochs=3, verbose=0, callbacks=[user_es])
    assert len(history.epoch) == 3  # user patience honored, not injected 1
