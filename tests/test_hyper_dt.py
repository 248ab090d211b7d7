# -*- coding:utf-8 -*-
"""AutoML layer (mirrors reference hyper_dt_test.py /
hyper_dt_experiment_test.py)."""

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_heart_disease_uci
from deeptables_tpu.models.hyper_dt import (DTEstimator, HyperDT,
                                            RandomSearcher, EvolutionSearcher,
                                            compile_dnn_params,
                                            make_experiment, mini_dt_space,
                                            mini_dt_space_validator,
                                            sample_to_config, tiny_dt_space)


@pytest.fixture(scope='module')
def data():
    df = load_heart_disease_uci(400)
    y = df.pop('target')
    return df, y


class TestSpaces:
    def test_sampling_and_compile(self):
        searcher = RandomSearcher(mini_dt_space,
                                  space_sample_validation_fn=
                                  mini_dt_space_validator, seed=1)
        for _ in range(20):
            s = searcher.sample()
            assert s['config']['nets'] != ['fm_nets']
            conf = sample_to_config(s, metrics=['AUC'])
            assert len(conf.dnn_params['hidden_units']) == 2

    def test_dnn_geometry(self):
        dnn = {'hidden_units': 100, 'reduce_factor': 0.5, 'dnn_dropout': 0.1,
               'use_bn': True, 'dnn_layers': 3, 'activation': 'relu'}
        params = compile_dnn_params(dnn)
        assert params['hidden_units'] == ((100, 0.1, True), (50, 0.1, True),
                                          (25, 0.1, True))


class TestSearch:
    def test_random_search(self, data, tmp_path):
        df, y = data
        hdt = HyperDT(space_fn=tiny_dt_space, reward_metric='AUC',
                      earlystopping_patience=1)
        best = hdt.search(df, y, max_trials=3, epochs=1, verbose=0,
                          trial_store_dir=str(tmp_path))
        assert best is not None and best.succeeded
        assert np.isfinite(best.reward)
        assert len(hdt.history) == 3
        board = hdt.leaderboard()
        assert len(board) == 3
        # best-trial reload
        est = hdt.load_estimator(best.model_path)
        proba = est.predict_proba(df.head(20))
        assert proba.shape == (20, 2)

    def test_final_train(self, data):
        df, y = data
        hdt = HyperDT(space_fn=tiny_dt_space, reward_metric='AUC')
        hdt.search(df, y, max_trials=2, epochs=1, verbose=0)
        est = hdt.final_train(df, y, epochs=1, verbose=0)
        assert est.predict_proba(df.head(10)).shape == (10, 2)

    def test_export_trial_configuration(self, data):
        df, y = data
        hdt = HyperDT(space_fn=tiny_dt_space, reward_metric='AUC')
        hdt.search(df, y, max_trials=1, epochs=1, verbose=0)
        desc = hdt.export_trial_configuration(hdt.best_trial)
        assert 'ModelConfig(' in desc

    def test_evolution_searcher(self, data):
        df, y = data
        searcher = EvolutionSearcher(tiny_dt_space, population_size=2)
        hdt = HyperDT(searcher=searcher, reward_metric='AUC')
        hdt.search(df, y, max_trials=3, epochs=1, verbose=0)
        assert hdt.best_trial is not None


class TestExperiment:
    def test_make_experiment(self, data):
        df, y = data
        train = df.copy()
        train['target'] = y
        exp = make_experiment(train, target='target', reward_metric='AUC',
                              search_space=tiny_dt_space, max_trials=2,
                              epochs=1, verbose=0)
        est = exp.run()
        proba = est.predict_proba(df.head(10))
        assert proba.shape == (10, 2)

    def test_make_experiment_cv(self, data):
        df, y = data
        train = df.copy()
        train['target'] = y
        exp = make_experiment(train, target='target', reward_metric='AUC',
                              search_space=tiny_dt_space, max_trials=1,
                              cv=True, num_folds=2, epochs=1, verbose=0)
        est = exp.run()
        assert est.model.task == 'binary'


class TestRegressionSearch:
    """Parity: reference hyper_dt_regression_test.py — random search with an
    RMSE reward (minimize) on boston, then final_train + evaluate."""

    def test_boston_rmse(self):
        from deeptables_tpu.data.datasets import load_boston
        from sklearn.model_selection import train_test_split

        df = load_boston(400)
        y = df.pop('target')
        X_train, X_test, y_train, y_test = train_test_split(
            df, y, test_size=0.2, random_state=42)

        hdt = HyperDT(space_fn=tiny_dt_space,
                      reward_metric='RootMeanSquaredError')
        assert not hdt._greater_is_better
        best = hdt.search(X_train, y_train, X_test, y_test,
                          max_trials=3, epochs=1, verbose=0)
        assert best is not None and best.succeeded
        assert np.isfinite(best.reward)
        # minimize: best reward is the smallest observed
        rewards = [t.reward for t in hdt.history if t.succeeded]
        assert best.reward == min(rewards)

        est = hdt.final_train(df, y, epochs=1, verbose=0)
        assert est.model.task == 'regression'
        pred = est.predict(X_test.head(10))
        assert pred.shape[0] == 10
        scores = est.evaluate(X_test, y_test)
        assert any(k.lower() == 'rootmeansquarederror' for k in scores)
