# -*- coding:utf-8 -*-
"""Single-input-kind models (mirrors reference model_input_test.py)."""

import numpy as np
import pandas as pd
import pytest

from deeptables_tpu.models import DeepTable, ModelConfig


def _y(n, rng):
    return pd.Series(rng.choice(['a', 'b'], n))


class TestModelInput:
    def test_only_categorical(self):
        rng = np.random.default_rng(0)
        n = 300
        df = pd.DataFrame({'c1': rng.choice(list('abc'), n),
                           'c2': rng.choice(list('defg'), n)})
        dt = DeepTable(ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                                   embedding_dropout=0))
        dt.fit(df, _y(n, rng), epochs=1, verbose=0)
        arrays_keys = set()
        from deeptables_tpu.data import pipeline
        arrays = pipeline.extract_arrays(
            dt.preprocessor.transform_X(df),
            dt.preprocessor.categorical_columns,
            dt.preprocessor.continuous_columns,
            dt.preprocessor.var_len_categorical_columns)
        assert set(arrays.keys()) == {'cat'}

    def test_only_continuous(self):
        rng = np.random.default_rng(1)
        n = 300
        df = pd.DataFrame({'n1': rng.normal(size=n),
                           'n2': rng.normal(size=n)})
        dt = DeepTable(ModelConfig(nets=['dnn_nets'], metrics=['AUC']))
        dt.fit(df, _y(n, rng), epochs=1, verbose=0)
        from deeptables_tpu.data import pipeline
        arrays = pipeline.extract_arrays(
            dt.preprocessor.transform_X(df),
            dt.preprocessor.categorical_columns,
            dt.preprocessor.continuous_columns,
            dt.preprocessor.var_len_categorical_columns)
        assert len(arrays) == 1 and 'cat' not in arrays

    def test_empty_x_raises(self):
        rng = np.random.default_rng(2)
        df = pd.DataFrame(index=range(10))
        with pytest.raises(ValueError):
            DeepTable(ModelConfig()).fit(df, _y(10, rng), epochs=1, verbose=0)
