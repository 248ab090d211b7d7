# -*- coding:utf-8 -*-
"""Model explanation: permutation feature importance and (optional) SHAP
(mirrors the reference's SHAP notebook; utils/feature_importance.py and
utils/shap.py in the reference).
"""

from sklearn.model_selection import train_test_split

from deeptables_tpu.datasets import dsutils
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.utils.feature_importance import (get_score_importances,
                                                     select_features)


def main():
    df = dsutils.load_bank(n_rows=4000)
    y = df.pop('y')
    X_train, X_test, y_train, y_test = train_test_split(
        df, y, test_size=0.3, random_state=42)

    conf = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                       metrics=['AUC'], earlystopping_patience=3)
    dt = DeepTable(config=conf)
    dt.fit(X_train, y_train, epochs=5, batch_size=256)

    # permutation importance: mean score decrease per shuffled column
    importances = get_score_importances(dt, X_test, y_test,
                                        metric='AUC', n_iter=3, mode='max')
    print('top-10 features by permutation importance:')
    for col, imp in importances[:10]:
        print(f'  {col}: {float(imp):+.5f}')

    selected, discarded = select_features(importances, threshold=0.0)
    print(f'{len(selected)} features selected, {len(discarded)} discardable')

    # SHAP values (only when the optional `shap` package is installed)
    try:
        from deeptables_tpu.utils.shap import DeepTablesExplainer
        explainer = DeepTablesExplainer(dt, X_train, num_samples=50)
        shap_values = explainer.get_shap_values(X_test.head(5), nsamples=100)
        print('shap values:', getattr(shap_values, 'shape', type(shap_values)))
    except ImportError:
        print('shap not installed; skipping KernelSHAP demo')


if __name__ == '__main__':
    main()
