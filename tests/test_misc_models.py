# -*- coding:utf-8 -*-
"""Smaller parity pieces: IgnoreCaseDict, ModelDesc, multilabel CV,
history-based ModelInfo scoring."""

import numpy as np
import pandas as pd
import pytest

from deeptables_tpu.models import DeepTable, IgnoreCaseDict, ModelConfig
from deeptables_tpu.models.deepmodel import ModelDesc
from deeptables_tpu.utils import consts


class TestIgnoreCaseDict:
    def test_case_insensitive(self):
        d = IgnoreCaseDict({'AUC': 0.9, 'Loss': 0.1})
        assert d['auc'] == 0.9
        assert d['AUC'] == 0.9
        assert 'loss' in d and 'LOSS' in d
        d['RMSE'] = 1.0
        assert d['rmse'] == 1.0

    def test_non_str_key_raises(self):
        with pytest.raises(KeyError):
            IgnoreCaseDict({1: 2})
        d = IgnoreCaseDict({'a': 1})
        with pytest.raises(KeyError):
            _ = d[1]


class TestModelDesc:
    def test_render(self):
        desc = ModelDesc()
        desc.add_input('all_categorical_vars', 5)
        desc.set_embeddings([10, 20], [4, 4], 0.3)
        desc.add_net('fm', (None, 5, 4), (None, 1))
        desc.nets = ['fm_nets']
        text = str(desc)
        assert 'Model Desc' in text
        assert 'fm' in text
        assert 'input_dims: [10, 20]' in text


class TestMultilabelCV:
    def test_cv_multilabel(self):
        rng = np.random.default_rng(0)
        n, n_labels = 300, 3
        df = pd.DataFrame({
            'c1': rng.choice(list('abcd'), n),
            'n1': rng.normal(size=n),
            'n2': rng.normal(size=n),
        })
        y = (rng.random((n, n_labels)) > 0.5).astype(np.float32)
        conf = ModelConfig(nets=['dnn_nets'], metrics=['accuracy'],
                           task=consts.TASK_MULTILABEL, embedding_dropout=0)
        dt = DeepTable(config=conf)
        oof, _, _ = dt.fit_cross_validation(df, y, num_folds=2, epochs=1,
                                            verbose=0)
        assert oof.shape == (n, n_labels)
        assert not np.isnan(oof).any()


class TestStackingEdge:
    def test_single_net_multioutput_flattened(self):
        # dcn_nets alone returns a wide tensor; head must handle it
        rng = np.random.default_rng(1)
        df = pd.DataFrame({'c': rng.choice(list('ab'), 200),
                           'n': rng.normal(size=200)})
        y = pd.Series(rng.choice([0, 1], 200))
        conf = ModelConfig(nets=['dcn_nets'], metrics=['AUC'],
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        dt.fit(df, y, epochs=1, verbose=0)
        assert dt.predict_proba(df.head(10)).shape == (10, 2)
