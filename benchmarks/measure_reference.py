# -*- coding:utf-8 -*-
"""Measure the reference implementation's training throughput and write
``benchmarks/baseline_ref.json`` (consumed by bench.py's ``vs_baseline``).

Two modes, tried in order:

1. **Full reference** — if DeepTables + hypernets are importable, run
   ``deeptables.models.DeepTable.fit`` on the synthetic Criteo data
   (reference call stack SURVEY.md §3.1).
2. **Faithful tf.keras graph** — otherwise (hypernets is absent in this
   environment) build the same Keras functional model the reference's
   ``DeepModel.__build_model`` produces for
   ``nets=['linear','fm_nets','dnn_nets']``:

   - one ``(n_cat,)`` int input split column-wise into per-column
     ``tf.keras.layers.Embedding`` lookups (reference
     ``MultiColumnEmbedding``, deeptables/models/layers.py:815-904),
   - FM second-order pooling ``0.5*sum((sum_f e)^2 - sum_f e^2)``
     (layers.py:27-60),
   - linear over the concatenated flat embeddings + dense columns
     (deepnets.py:43-66), ``dnn_nets`` MLP 1024→512 relu
     (deepnets.py:163-170, dnn() 401-427),
   - per-net logits stacked by add, sigmoid head, Adam(1e-3), BCE
     (deepmodel.py:286-346, 436-457).

   The graph is trained with a ``tf.function`` step on pre-staged tensors
   (more favourable to TF than ``model.fit``'s Python callback loop, so
   the baseline is not handicapped).

The measured number is tagged with the substrate it ran on
(``device: cpu-host`` here — TF has no path to the tunneled TPU). bench.py
compares per accelerator chip, so ``criteo_deepfm_examples_per_sec`` is
only written by this script when TF sees an accelerator; on CPU the result
goes to ``criteo_deepfm_examples_per_sec_cpu_host`` and the accelerator
estimate in bench.py remains in force (with this CPU measurement recorded
as the measured anchor).

Usage: python benchmarks/measure_reference.py [batch_size] [seconds]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'baseline_ref.json')


def _try_full_reference():
    try:
        import deeptables.models  # noqa: F401
        return True
    except Exception:
        return False


def measure_keras_deepfm(batch_size=8192, bench_seconds=10.0, emb_dim=16):
    import tensorflow as tf

    from deeptables_tpu.data.datasets import load_criteo_synthetic

    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=batch_size * 4, return_arrays=True)
    n_cat = cat.shape[1]

    K = tf.keras.ops  # Keras 3: symbolic tensors require keras.ops

    cat_in = tf.keras.Input(shape=(n_cat,), dtype='int32', name='cat_all')
    dense_in = tf.keras.Input(shape=(dense.shape[1],), name='dense_all')
    # per-column embedding tables, reference MultiColumnEmbedding semantics
    embs = []
    for i, v in enumerate(vocab_sizes):
        e = tf.keras.layers.Embedding(int(v) + 1, emb_dim)(cat_in[:, i])
        embs.append(e)
    stack = K.stack(embs, axis=1)                       # (B, F, D)
    # FM second order (layers.py:27-60)
    sum_sq = K.square(K.sum(stack, axis=1))
    sq_sum = K.sum(K.square(stack), axis=1)
    fm_logit = 0.5 * K.sum(sum_sq - sq_sum, axis=1, keepdims=True)
    flat = K.concatenate(
        [K.reshape(stack, (-1, n_cat * emb_dim)), dense_in], axis=1)
    linear_logit = tf.keras.layers.Dense(1)(flat)
    h = tf.keras.layers.Dense(1024, activation='relu')(flat)
    h = tf.keras.layers.Dense(512, activation='relu')(h)
    dnn_logit = tf.keras.layers.Dense(1)(h)
    logit = tf.keras.layers.Add()([linear_logit, fm_logit, dnn_logit])
    model = tf.keras.Model([cat_in, dense_in], logit)
    opt = tf.keras.optimizers.Adam(1e-3)
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)

    n_batches = 4
    cat_t = tf.constant(cat[:n_batches * batch_size]
                        .reshape(n_batches, batch_size, n_cat))
    dense_t = tf.constant(dense[:n_batches * batch_size]
                          .reshape(n_batches, batch_size, -1))
    y_t = tf.constant(y[:n_batches * batch_size]
                      .reshape(n_batches, batch_size, 1))

    @tf.function(jit_compile=False)
    def step(i):
        with tf.GradientTape() as tape:
            out = model([cat_t[i], dense_t[i]], training=True)
            loss = bce(y_t[i], out)
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    step(tf.constant(0))  # trace + warm
    t0 = time.perf_counter()
    steps = 0
    while time.perf_counter() - t0 < bench_seconds:
        loss = step(tf.constant(steps % n_batches))
        steps += 1
    _ = float(loss)
    elapsed = time.perf_counter() - t0
    has_accel = bool(tf.config.list_physical_devices('GPU')
                     or tf.config.list_physical_devices('TPU'))
    return {
        'examples_per_sec': round(steps * batch_size / elapsed, 1),
        'steps': steps, 'batch_size': batch_size,
        'device': 'accelerator' if has_accel else 'cpu-host',
        'tf_version': tf.__version__,
        'graph': 'keras functional DeepFM (linear+fm+dnn 1024/512), '
                 'tf.function train step on pre-staged tensors',
    }


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    out = {}
    if os.path.exists(_OUT):
        try:
            with open(_OUT) as f:
                out = json.load(f)
        except Exception:
            out = {}

    full = _try_full_reference()
    out['full_reference_importable'] = full
    res = measure_keras_deepfm(batch_size, seconds)
    print(json.dumps(res), flush=True)
    if res['device'] == 'accelerator':
        out['criteo_deepfm_examples_per_sec'] = res['examples_per_sec']
        out['criteo_deepfm_measurement'] = res
    else:
        out['criteo_deepfm_examples_per_sec_cpu_host'] = res[
            'examples_per_sec']
        out['criteo_deepfm_cpu_host_measurement'] = res
        out.setdefault(
            'note',
            'TF sees no accelerator in this environment; the per-chip '
            'reference number used by bench.py remains the documented '
            'estimate, anchored by this measured CPU-host run.')
    with open(_OUT, 'w') as f:
        json.dump(out, f, indent=1)
    print(f'wrote {_OUT}', flush=True)


if __name__ == '__main__':
    main()
