# -*- coding:utf-8 -*-
"""AutoML: search over nets + preprocessing + DNN geometry (mirrors the
reference's AutoML notebook / make_experiment flow, hyper_dt.py:452)."""

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import make_experiment


def main():
    df = dsutils.load_heart_disease_uci()
    df = df.rename(columns={'target': 'y'})

    experiment = make_experiment(
        df, target='y', reward_metric='AUC', max_trials=5,
        epochs=5, verbose=0)
    estimator = experiment.run()

    print('best trial:', experiment.hyper_model.best_trial.trial_no,
          'reward:', experiment.hyper_model.best_trial.reward)
    print(experiment.hyper_model.leaderboard())
    print(experiment.hyper_model.export_trial_configuration(
        experiment.hyper_model.best_trial))

    X = df.drop(columns=['y'])
    print('proba:', estimator.predict_proba(X.head(5)))


if __name__ == '__main__':
    main()
