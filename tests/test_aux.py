# -*- coding:utf-8 -*-
"""Auxiliary subsystems: feature importance, DAE, target encoding, EDA,
quicktest (mirrors reference utils/fe/eda tests)."""

import numpy as np
import pandas as pd
import pytest

from deeptables_tpu.data.datasets import load_bank


class TestFeatureImportance:
    def test_permutation_importance(self):
        from deeptables_tpu.models import DeepTable, ModelConfig
        from deeptables_tpu.utils.feature_importance import (
            get_score_importances, select_features)
        df = load_bank(400)
        y = df.pop('y')
        dt = DeepTable(ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                                   embedding_dropout=0))
        dt.fit(df, y, epochs=1, verbose=0)
        X_small = df.head(100)
        y_small = y.head(100)
        fi = get_score_importances(dt, X_small, y_small, 'AUC', n_iter=1,
                                   mode='max')
        assert fi.shape == (df.shape[1], 2)
        # shuffling real columns must actually move the score: all-zero
        # importances mean the scoring round-trip broke (dtype loss)
        assert np.abs(fi[:, 1].astype(float)).sum() > 0
        selected, discarded = select_features(fi, threshold=-np.inf)
        assert len(selected) + len(discarded) == df.shape[1]


class TestDAE:
    def test_fit_transform(self):
        from deeptables_tpu.fe import DAE
        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 10)).astype(np.float32)
        dae = DAE(encoder_units=(32, 32), feature_units=5, noise_rate=0.1)
        feats = dae.fit_transform(X, batch_size=64, epochs=10, verbose=0)
        assert feats.shape == (200, 5)
        assert np.isfinite(feats).all()

    def test_no_noise(self):
        from deeptables_tpu.fe import DAE
        rng = np.random.default_rng(1)
        X = rng.normal(size=(100, 6)).astype(np.float32)
        dae = DAE(encoder_units=(16, 16), feature_units=3, noise_rate=0)
        feats = dae.fit_transform(X, batch_size=32, epochs=5, verbose=0)
        assert feats.shape == (100, 3)


class TestTargetEncoding:
    def test_target_encoding(self):
        from deeptables_tpu.preprocessing import target_encoding
        rng = np.random.default_rng(0)
        n = 300
        train = pd.DataFrame({
            'c1': rng.choice(list('abc'), n),
            'c2': rng.choice(list('xyz'), n),
            'y': rng.integers(0, 2, n),
        })
        test = train.head(50).drop(columns=['y'])
        tr_enc, te_enc, features, target = target_encoding(
            train.copy(), 'y', test=test, feat_to_encode=['c1', 'c2'])
        assert set(features) == {'c1', 'c2'}
        assert tr_enc['c1'].dtype.kind == 'f'
        assert te_enc.shape == (50, 2)
        assert len(target) == n

    def test_target_rate_encoding(self):
        from deeptables_tpu.preprocessing import target_rate_encodeing
        rng = np.random.default_rng(1)
        df = pd.DataFrame({'c': rng.choice(list('abcd'), 200),
                           'y': rng.integers(0, 2, 200)})
        out = target_rate_encodeing(['c'], 'y', df, mode='order')
        assert 'c_tre' in out.columns
        out2 = target_rate_encodeing(['c'], 'y', df, mode='rate')
        assert out2['c_tre'].between(0, 1).all()


class TestEda:
    def test_columns_info(self):
        df = load_bank(200)
        info = __import__('deeptables_tpu.eda', fromlist=['columns_info']) \
            .columns_info(df)
        assert '#Uniques' in info.columns
        assert len(info) == df.shape[1]

    def test_reduce_mem_usage(self):
        from deeptables_tpu.eda import reduce_mem_usage
        df = pd.DataFrame({'a': np.arange(100, dtype=np.int64),
                           'b': np.random.rand(100)})
        out = reduce_mem_usage(df.copy(), verbose=False)
        assert out['a'].dtype == np.int8

    def test_split_seq(self):
        from deeptables_tpu.eda import split_seq
        assert list(split_seq(range(9), 4)) == [[0, 1, 2, 3], [4, 5, 6, 7],
                                                [8]]

    def test_top_categories(self):
        from deeptables_tpu.eda import top_categories
        df = load_bank(200)
        top = top_categories(df, 'job', topN=3)
        assert len(top) == 3


class TestQuicktest:
    def test_quicktest(self):
        from deeptables_tpu.utils import quicktest
        dt = quicktest.test()
        assert dt.task == 'binary'


class TestDartEarlyStopping:
    def test_requires_lightgbm(self):
        from deeptables_tpu.utils.dart_early_stopping import \
            dart_early_stopping
        try:
            import lightgbm  # noqa
            has_lgbm = True
        except ImportError:
            has_lgbm = False
        if has_lgbm:
            cb = dart_early_stopping(5)
            assert callable(cb)
        else:
            with pytest.raises(ImportError):
                dart_early_stopping(5)


class TestShapGate:
    def test_shap_gate(self):
        from deeptables_tpu.utils import shap as shap_mod
        if not shap_mod.have_shap:
            with pytest.raises(ImportError):
                shap_mod.DeepTablesExplainer(None, None)
