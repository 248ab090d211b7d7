# -*- coding:utf-8 -*-
"""K-fold cross validation with OOF predictions and test-set ensembling
(mirrors the reference's CV notebook)."""

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.utils import consts


def main():
    df = dsutils.load_bank(8000)
    y = df.pop('y')
    X_test = df.sample(1000, random_state=1)

    conf = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                       metrics=['AUC'])
    dt = DeepTable(config=conf)
    oof_proba, _, test_proba, oof_scores = dt.fit_cross_validation(
        df, y, X_test=X_test, num_folds=5, stratified=True, epochs=5,
        oof_metrics=['AUC', 'accuracy'])

    print('per-fold OOF scores:', oof_scores)
    print('leaderboard:\n', dt.leaderboard)

    # ensemble over all folds
    proba = dt.predict_proba(df.head(100),
                             model_selector=consts.MODEL_SELECTOR_ALL)
    print('ensemble proba:', proba[:3])


if __name__ == '__main__':
    main()
