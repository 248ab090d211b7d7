# -*- coding:utf-8 -*-
"""Cross-validation: OOF shapes, per-fold models, ensemble predict,
save/load (mirrors reference deeptable_cv_test.py)."""

import os

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.utils import consts


@pytest.fixture(scope='module')
def cv_fitted():
    df = load_bank(600)
    y = df.pop('y')
    X_test = df.head(100)
    conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                       embedding_dropout=0)
    dt = DeepTable(config=conf)
    oof, eval_proba, test_proba = dt.fit_cross_validation(
        df, y, X_eval=None, X_test=X_test, num_folds=3, epochs=1, verbose=0,
        stratified=True)
    return dt, df, y, X_test, oof, test_proba


class TestCV:
    def test_oof_shape(self, cv_fitted):
        dt, df, y, _, oof, _ = cv_fitted
        assert oof.shape == (len(df), 2)
        assert not np.isnan(oof).any()

    def test_test_proba_mean(self, cv_fitted):
        dt, _, _, X_test, _, test_proba = cv_fitted
        assert test_proba.shape == (len(X_test), 2)

    def test_fold_models_saved(self, cv_fitted):
        dt, *_ = cv_fitted
        infos = dt.modelset.get_modelinfos()
        assert len(infos) == 3
        for mi in infos:
            assert 'kfold' in mi.name

    def test_ensemble_predict(self, cv_fitted):
        dt, df, *_ = cv_fitted
        proba = dt.predict_proba(df.head(50),
                                 model_selector=consts.MODEL_SELECTOR_ALL)
        assert proba.shape == (50, 2)

    def test_proba_all(self, cv_fitted):
        dt, df, *_ = cv_fitted
        probas = dt.predict_proba_all(df.head(30))
        assert len(probas) == 3

    def test_oof_metrics(self):
        df = load_bank(400)
        y = df.pop('y')
        conf = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           embedding_dropout=0)
        dt = DeepTable(config=conf)
        oof, _, _, oof_scores = dt.fit_cross_validation(
            df, y, num_folds=2, epochs=1, verbose=0,
            oof_metrics=['AUC', 'accuracy'])
        assert len(oof_scores) == 2
        assert all('AUC' in s for s in oof_scores)

    def test_cv_save_load(self, cv_fitted, tmp_path):
        dt, df, *_ = cv_fitted
        path = str(tmp_path / 'cv_model')
        dt.save(path)
        dt2 = DeepTable.load(path)
        proba = dt2.predict_proba(df.head(20),
                                  model_selector=consts.MODEL_SELECTOR_ALL)
        assert proba.shape == (20, 2)
