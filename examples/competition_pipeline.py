# -*- coding:utf-8 -*-
"""Competition-style pipeline composing the full toolkit — the analog of
the reference's bundled Kaggle "Categorical Feature Encoding Challenge II"
winning-solution notebook (/root/reference/README.md:107-109,
deeptables/examples/Kaggle - Categorical Feature Encoding Challenge II.ipynb).

Flow (all on one synthetic categorical dataset):
 1. k-fold OOF target encoding of the raw categoricals
    (preprocessing/utils.target_encoding),
 2. denoising-autoencoder bottleneck features over the encoded frame
    (fe/dae.DAE with swap noise),
 3. two DeepTable configs trained with fit_cross_validation (OOF probas),
 4. a blended submission: rank-average of the per-config mean test probas,
 5. OOF AUC for each stage so the lift of every component is visible.

Run: JAX_PLATFORMS=cpu python examples/competition_pipeline.py
"""

import numpy as np
import pandas as pd
from sklearn.metrics import roc_auc_score
from sklearn.model_selection import train_test_split

from deeptables_tpu.fe.dae import DAE
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.preprocessing.utils import target_encoding


def make_cat_dataset(n=6000, seed=11):
    """CFE-II-like data: only categorical columns, binary target."""
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        'bin_0': rng.integers(0, 2, n),
        'bin_1': rng.choice(['T', 'F'], n),
        'nom_0': rng.choice(list('RGB'), n),
        'nom_1': rng.choice([f'n{i}' for i in range(12)], n),
        'nom_2': rng.choice([f'm{i}' for i in range(40)], n),
        'ord_0': rng.integers(1, 4, n),
        'ord_1': rng.choice(['Novice', 'Contributor', 'Expert',
                             'Master', 'Grandmaster'], n),
        'day': rng.integers(1, 8, n),
        'month': rng.integers(1, 13, n),
    })
    signal = ((df['nom_0'] == 'R') * 0.8
              + df['ord_0'] * 0.4
              + (df['ord_1'].isin(['Master', 'Grandmaster'])) * 0.9
              + np.sin(df['nom_1'].str[1:].astype(int)) * 0.5
              + rng.normal(0, 1.0, n))
    df['target'] = (signal > np.quantile(signal, 0.7)).astype(int)
    return df


def main():
    df = make_cat_dataset()
    train_df, test_df = train_test_split(df, test_size=0.25,
                                         random_state=42,
                                         stratify=df['target'])
    y_test = test_df.pop('target').to_numpy()
    train_df = train_df.reset_index(drop=True)
    test_df = test_df.reset_index(drop=True)

    # -- 1. OOF target encoding -------------------------------------------
    feat_cols = [c for c in train_df.columns if c != 'target']
    tr_enc, te_enc, features, y_train = target_encoding(
        train_df.copy(), 'target', test=test_df.copy(),
        feat_to_encode=feat_cols)
    y_train = y_train.to_numpy()
    print(f'target-encoded features: {features}')

    # -- 2. DAE bottleneck features over the encoded frame ----------------
    dae = DAE(encoder_units=(64, 64), feature_units=8, noise_rate=0.1)
    dae_train = dae.fit_transform(tr_enc[features].to_numpy(np.float32),
                                  batch_size=256, epochs=30)
    dae_test = dae.transform(te_enc[features].to_numpy(np.float32))
    for i in range(dae_train.shape[1]):
        tr_enc[f'dae_{i}'] = dae_train[:, i]
        te_enc[f'dae_{i}'] = dae_test[:, i]
    print(f'DAE features appended: {dae_train.shape[1]}')

    # raw categoricals + target-encoded + DAE features side by side
    X_train = pd.concat(
        [train_df[feat_cols].reset_index(drop=True),
         tr_enc.add_prefix('te_')], axis=1)
    X_test = pd.concat(
        [test_df[feat_cols].reset_index(drop=True),
         te_enc.add_prefix('te_')], axis=1)

    # -- 3. two configs, k-fold CV with OOF probas ------------------------
    configs = {
        'dnn': ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           earlystopping_patience=2,
                           auto_categorize=False),
        'deepfm': ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                              metrics=['AUC'], earlystopping_patience=2),
    }
    test_probas, oof_aucs = {}, {}
    for name, conf in configs.items():
        dt = DeepTable(config=conf)
        oof, _eval, test_proba = dt.fit_cross_validation(
            X_train.copy(), y_train, X_test=X_test.copy(), num_folds=3,
            stratified=True, epochs=4, batch_size=256, verbose=0)
        oof1 = oof[:, 1] if oof.ndim > 1 else oof
        oof_aucs[name] = roc_auc_score(y_train, oof1)
        test_probas[name] = test_proba[:, 1] \
            if test_proba.ndim > 1 else test_proba
        print(f'{name}: OOF AUC = {oof_aucs[name]:.4f}')

    # -- 4. rank-average blend --------------------------------------------
    from scipy.stats import rankdata
    blend = np.mean([rankdata(p) / len(p) for p in test_probas.values()],
                    axis=0)
    for name, p in test_probas.items():
        print(f'test AUC [{name}]: {roc_auc_score(y_test, p):.4f}')
    print(f'test AUC [blend]:  {roc_auc_score(y_test, blend):.4f}')

    sub = pd.DataFrame({'id': np.arange(len(blend)), 'target': blend})
    out = '/tmp/dt_competition_submission.csv'
    sub.to_csv(out, index=False)
    print(f'submission written: {out}')


if __name__ == '__main__':
    main()
