# -*- coding:utf-8 -*-
"""Preprocessor column math (mirrors reference preprocessor_test.py)."""

import numpy as np
import pytest
from sklearn.model_selection import train_test_split

from deeptables_tpu.data.datasets import load_adult
from deeptables_tpu.models import ModelConfig
from deeptables_tpu.models.preprocessor import DefaultPreprocessor


class TestPreprocessor:
    def test_transform_columns(self):
        df_train = load_adult(2000)
        y = np.asarray(df_train.pop(14))
        X_train, X_test, y_train, y_test = train_test_split(
            df_train, y, test_size=0.2, random_state=42)
        conf = ModelConfig(auto_discrete=True, auto_imputation=True,
                          auto_encode_label=True, auto_categorize=True,
                          apply_gbm_features=False)
        processor = DefaultPreprocessor(conf, use_cache=False)
        X1, y1 = processor.fit_transform(X_train, y_train)
        X2, y2 = processor.transform(X_test, y_test)
        # auto-categorized numerics get _cat twins; discretized get _discrete
        assert any(c.endswith('_cat') for c in X1.columns)
        assert any(c.endswith('_discrete') for c in X1.columns)
        assert set(X1.columns) == set(X2.columns)
        assert X1.shape[0] == len(y1)
        # y encoded to ints
        assert set(np.unique(y1)) <= {0, 1}

    def test_categorical_columns_config(self):
        df_train = load_adult(1000)
        y = df_train.pop(14).values
        conf = ModelConfig(categorical_columns=['x_1', 'x_3', 'x_5'],
                          auto_discrete=False, auto_imputation=True,
                          auto_encode_label=True, auto_categorize=False)
        processor = DefaultPreprocessor(conf, use_cache=False)
        X, y = processor.fit_transform(df_train, y)
        assert set(processor.get_categorical_columns()) == \
            {'x_1', 'x_3', 'x_5'}
        # object columns not listed are discarded; numerics survive
        assert 'x_6' not in X.columns or 'x_6' not in \
            processor.get_categorical_columns()

    def test_inverse_transform_y(self):
        df = load_adult(500)
        y = df.pop(14).values
        processor = DefaultPreprocessor(ModelConfig(), use_cache=False)
        X1, y1 = processor.fit_transform(df, y)
        restored = processor.inverse_transform_y(y1)
        assert set(restored) == set(y)

    def test_missing_y_raises(self):
        df = load_adult(100)
        y = df.pop(14).values.astype(object)
        y[3] = None
        processor = DefaultPreprocessor(ModelConfig(), use_cache=False)
        with pytest.raises(ValueError, match='Missing values in y'):
            processor.fit_transform(df, y)

    def test_fit_cache(self):
        df = load_adult(400)
        y = df.pop(14).values
        p1 = DefaultPreprocessor(ModelConfig(), use_cache=True)
        X1, _ = p1.fit_transform(df, y)
        p2 = DefaultPreprocessor(ModelConfig(), use_cache=True)
        X2, _ = p2.fit_transform(df, y)
        assert list(X1.columns) == list(X2.columns)
        assert p2.task == p1.task

    def test_exclude_columns(self):
        df = load_adult(400)
        y = df.pop(14).values
        conf = ModelConfig(exclude_columns=['x_1'])
        p = DefaultPreprocessor(conf, use_cache=False)
        X, _ = p.fit_transform(df, y)
        assert 'x_1' not in p.get_categorical_columns()

    def test_auto_discard_unique(self):
        df = load_adult(300)
        y = df.pop(14).values
        df[2] = 1  # constant column
        p = DefaultPreprocessor(ModelConfig(), use_cache=False)
        p.fit_transform(df, y)
        assert 'x_2' not in p.get_categorical_columns() + \
            p.get_continuous_columns()

    def test_var_len_metainfo(self):
        from deeptables_tpu.data.datasets import load_movielens
        df = load_movielens(300)
        y = df.pop('rating')
        df = df.drop(columns=['title'])
        conf = ModelConfig(task='regression',
                          var_len_categorical_columns=[('genres', '|', 'max')])
        p = DefaultPreprocessor(conf, use_cache=False)
        X, _ = p.fit_transform(df, y)
        vc = p.var_len_categorical_columns[0]
        assert vc.name == 'genres'
        assert vc.max_elements_length >= 1
        assert isinstance(X['genres'].iloc[0], np.ndarray)

    def test_int_category_and_bool_columns(self):
        """Int-coded pandas Categorical and bool columns must take the
        numeric imputer fill (reference splits on obj/str dtype prefix,
        preprocessor.py:350-356); a '' fill on int categories crashes
        sklearn."""
        import pandas as pd
        rng = np.random.default_rng(0)
        n = 300
        df = pd.DataFrame({
            'c_int': pd.Categorical(rng.integers(0, 7, n)),
            'c_str': pd.Categorical(
                rng.choice(['a', 'b', 'c'], n).astype(object)),
            'flag': rng.integers(0, 2, n).astype(bool),
            'x': rng.normal(size=n),
        })
        y = rng.integers(0, 2, n)
        p = DefaultPreprocessor(ModelConfig(), use_cache=False)
        X, _ = p.fit_transform(df, y)
        cats = p.get_categorical_columns()
        assert len(cats) == 3  # c_int, c_str, flag all categorical
        assert all(np.issubdtype(X[c].dtype, np.integer) for c in cats)


class TestGbmLeavesEncoder:
    def _frame(self, n=200, seed=0):
        import pandas as pd
        rng = np.random.default_rng(seed)
        X = pd.DataFrame({'a': rng.normal(size=n),
                          'b': rng.integers(0, 5, n)})
        y = (X['a'] + rng.normal(scale=0.1, size=n) > 0).astype(int)
        return X, y

    def test_leaf_codes_vectorized(self):
        from deeptables_tpu.models.transformers import GbmLeavesEncoder
        classes = np.array([3, 7, 11])
        col = np.array([7, 3, 11, 5, 99])
        codes = GbmLeavesEncoder._leaf_codes(classes, col)
        # seen → index in sorted classes; unseen → len(classes)
        np.testing.assert_array_equal(codes, [1, 0, 2, 3, 3])
        assert codes.dtype == np.int32

    def test_sklearn_backend_roundtrip(self):
        from deeptables_tpu.models.transformers import GbmLeavesEncoder
        from deeptables_tpu.utils import consts
        X, y = self._frame()
        enc = GbmLeavesEncoder(['b'], ['a'], consts.TASK_BINARY,
                               n_estimators=4)
        Xt = enc.fit_transform(X.copy(), y)
        assert enc.backend == 'sklearn' or enc.backend == 'lightgbm'
        assert len(enc.new_columns) >= 4
        X2 = enc.transform(X.copy())
        for c in enc.new_columns:
            np.testing.assert_array_equal(np.asarray(Xt[c]),
                                          np.asarray(X2[c]))

    def test_lightgbm_backend_when_importable(self, monkeypatch):
        """Exercise the lightgbm branch with a stub module implementing the
        LGBMClassifier predict(..., pred_leaf=True) surface (the real
        package is optional; the reference uses it natively —
        /root/reference/deeptables/models/preprocessor.py:431-445)."""
        import sys
        import types
        from sklearn.ensemble import GradientBoostingClassifier

        class StubLGBMClassifier:
            def __init__(self, **params):
                self.params = params
                n = params.get('n_estimators', 10)
                self._m = GradientBoostingClassifier(
                    n_estimators=n, max_depth=params.get('max_depth', 3))

            def fit(self, X, y):
                self._m.fit(X, y)
                return self

            def predict(self, X, pred_leaf=False):
                assert pred_leaf
                return self._m.apply(X).reshape(len(X), -1)

        stub = types.ModuleType('lightgbm')
        stub.LGBMClassifier = StubLGBMClassifier
        stub.LGBMRegressor = StubLGBMClassifier
        monkeypatch.setitem(sys.modules, 'lightgbm', stub)

        from deeptables_tpu.models.transformers import GbmLeavesEncoder
        from deeptables_tpu.utils import consts
        X, y = self._frame()
        enc = GbmLeavesEncoder(['b'], ['a'], consts.TASK_BINARY,
                               num_boost_round=4, num_leaves=8)
        Xt = enc.fit_transform(X.copy(), y)
        assert enc.backend == 'lightgbm'
        # LightGBM-native names were translated for the stub
        assert enc.model.params['n_estimators'] == 4
        assert enc.model.params['num_leaves'] == 8
        assert len(enc.new_columns) == 4
        X2 = enc.transform(X.copy())
        for c in enc.new_columns:
            np.testing.assert_array_equal(np.asarray(Xt[c]),
                                          np.asarray(X2[c]))
