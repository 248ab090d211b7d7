# -*- coding:utf-8 -*-
"""Measured AUC/logloss parity vs the TF reference graph (north-star
accuracy clause; VERDICT r3 missing #1).

For each BASELINE.json config this trains BOTH sides on the SAME data and
protocol and records final test AUC/logloss over N seeds:

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
                                              load_bank,
                                              load_criteo_synthetic)
    return {
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


def _split(df, target):
    from sklearn.model_selection import train_test_split
    y = np.asarray(df.pop(target))
    return train_test_split(df, y, test_size=0.2, random_state=42,
                            stratify=y)


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def run_ours(name, spec, seed):
    from deeptables_tpu.models import DeepTable, ModelConfig
    X_train, X_test, y_train, y_test = _split(spec['loader'](),
                                              spec['target'])
    conf = ModelConfig(nets=spec['nets'], metrics=['AUC', 'logloss'],
                       earlystopping_patience=3, seed=seed,
                       home_dir='/tmp/dt_parity', **spec['conf'])
    dt = DeepTable(config=conf)
    t0 = time.time()
    dt.fit(X_train, y_train, epochs=EPOCHS, batch_size=BATCH, verbose=0)
    score = dt.evaluate(X_test, y_test, verbose=0)
    return {'auc': float(score['AUC']), 'logloss': float(score['logloss']),
            'fit_seconds': round(time.time() - t0, 1)}


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


def build_tf_model(nets, cat_specs, n_dense, conf):
    import tensorflow as tf
    K = tf.keras.ops

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
    output = tf.keras.layers.Dense(1, activation='sigmoid',
                                   name='task_output')(x)
    model = tf.keras.Model(inputs, output)
    model.compile(tf.keras.optimizers.Adam(1e-3),
                  tf.keras.losses.BinaryCrossentropy(),
                  metrics=[tf.keras.metrics.AUC(name='auc')])
    return model


def run_tf(name, spec, seed):
    import tensorflow as tf
    from sklearn.metrics import log_loss, roc_auc_score
    tf.keras.utils.set_random_seed(seed)
    X_train, X_test, y_train, y_test = _split(spec['loader'](),
                                              spec['target'])
    (tr, te, yt, cat_specs) = _tf_preprocess(spec, X_train, X_test, y_train)
    conf = dict(spec['conf'])
    model = build_tf_model(spec['nets'], cat_specs,
                           tr[1].shape[1] if tr[1] is not None else 0, conf)
    feats_tr = [a for a in tr if a is not None]
    feats_te = [a for a in te if a is not None]
    es = tf.keras.callbacks.EarlyStopping(
        monitor='val_auc', mode='max', patience=3,
        restore_best_weights=True)
    t0 = time.time()
    model.fit(feats_tr, yt, epochs=EPOCHS, batch_size=BATCH,
              validation_split=0.2, callbacks=[es], verbose=0)
    proba = model.predict(feats_te, batch_size=4096,
                          verbose=0).reshape(-1)
    y_true = np.asarray(y_test)
    if y_true.dtype.kind in 'OUSb':  # label-encode like transform_y
        classes = sorted(np.unique(y_true))
        y_true = np.asarray([classes.index(v) for v in y_true])
    return {'auc': float(roc_auc_score(y_true, proba)),
            'logloss': float(log_loss(y_true, np.clip(proba, 1e-7,
                                                      1 - 1e-7))),
            'fit_seconds': round(time.time() - t0, 1),
            'tf_version': tf.__version__}


# ---------------------------------------------------------------------------

def _load():
    if os.path.exists(_OUT):
        with open(_OUT) as f:
            return json.load(f)
    return {}


def _save(res):
    with open(_OUT, 'w') as f:
        json.dump(res, f, indent=1)


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
                _save(res)  # save per seed (tunnel flakes mid-config)
    # report
    print(f'\n{"config":22s} {"ours AUC":>16s} {"tf AUC":>16s} '
          f'{"ours logloss":>14s} {"tf logloss":>14s}')
    for name, sides in res.items():
        def ms(side, key):
            xs = [r[key] for r in sides.get(side, [])]
            if not xs:
                return '—'
            return f'{np.mean(xs):.4f}±{np.std(xs):.4f}'
        print(f'{name:22s} {ms("ours", "auc"):>16s} {ms("tf", "auc"):>16s} '
              f'{ms("ours", "logloss"):>14s} {ms("tf", "logloss"):>14s}')


if __name__ == '__main__':
    main()
