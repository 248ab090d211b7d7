# -*- coding:utf-8 -*-
"""Model-zoo throughput + accuracy benchmark harness.

Covers the BASELINE.json single-chip configs:
1. DeepFM on Criteo-style (26 cat + 13 dense)
2. Wide&Deep + DCN cross-net on Adult-style (8 cat + 6 dense)
3. xDeepFM with CIN 128x128 on Criteo-style
4. AutoInt (3 blocks, 2 heads) on Avazu-style (22 cat)

Throughput uses the pipelined-fetch scan-chunk methodology (see
benchmarks/timing.py) — the same measurement discipline as bench.py — and
records XLA's own per-step cost analysis (flops, bytes accessed) plus a
roofline statement (which bound each config hits and what fraction of it
the measured step achieves).

Usage: python benchmarks/bench_models.py [quality|throughput|all|formulations]
- quality / throughput / all: the config tables above →
  benchmarks/results_models.json
- formulations: in-situ A/B of every frozen hot-path default with a
  stale-default flag (round 5; see the section below) →
  benchmarks/formulations_results.json
(`_probe <config>` is the internal per-subprocess entry the
formulations mode spawns.)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import timing  # noqa: E402

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'results_models.json')


def _throughput_for(nets, cat, dense, y, vocab_sizes, emb_dim=16,
                    batch_size=8192, bench_seconds=5.0, dtype='bfloat16',
                    steps_per_chunk=512, dnn_units=((1024, 0, False),
                                                    (512, 0, False)),
                    with_cost=True, **config_kw):
    import jax
    import optax

    from deeptables_tpu.models.config import ModelConfig
    from deeptables_tpu.models.deepmodel import DeepModel
    from deeptables_tpu.models.metainfo import (CategoricalColumn,
                                                ContinuousColumn)
    from deeptables_tpu.ops import losses as losses_lib

    config = ModelConfig(
        nets=nets, metrics=['AUC'], task='binary', embedding_dropout=0,
        embeddings_output_dim=emb_dim, dtype_policy=dtype,
        dnn_params={'hidden_units': tuple(dnn_units), 'activation': 'relu'},
        home_dir='/tmp/dt_bench', **config_kw)
    cat_cols = tuple(CategoricalColumn(f'C{i + 1}', int(v) + 1, emb_dim)
                     for i, v in enumerate(vocab_sizes))
    cont_cols = ()
    if dense is not None:
        cont_cols = (ContinuousColumn(
            'input_continuous_all',
            [f'I{i + 1}' for i in range(dense.shape[1])]),)
    model = DeepModel('binary', 2, config, cat_cols, cont_cols)

    n_batches = min(len(y) // batch_size, 8)

    def mk_stack():
        b = {'cat': jax.device_put(
            cat[:n_batches * batch_size].reshape(n_batches, batch_size, -1))}
        if dense is not None:
            b['input_continuous_all'] = jax.device_put(
                dense[:n_batches * batch_size].reshape(
                    n_batches, batch_size, -1))
        return b, jax.device_put(
            y[:n_batches * batch_size].reshape(n_batches, batch_size))

    sample = {'cat': cat[:2]}
    if dense is not None:
        sample['input_continuous_all'] = dense[:2]
    model.build(sample_batch=sample)
    tx = optax.adam(1e-3)
    model._tx = tx
    opt_state = jax.jit(tx.init)(model.variables['params'])
    module = model.module
    loss_fn = losses_lib.binary_crossentropy

    def train_step(params, batch_stats, opt_state, batch, yb, rng):
        def compute_loss(p):
            (logits, _), mutated = module.apply(
                {'params': p, 'batch_stats': batch_stats}, batch,
                training=True, rngs={'dropout': rng},
                mutable=['batch_stats'])
            return loss_fn(logits, yb), mutated.get('batch_stats', {})

        (loss, new_bs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    chunk = timing.make_train_chunk(train_step, n_batches, steps_per_chunk)
    chunk_jit = jax.jit(chunk, donate_argnums=(0, 1, 2))
    stacked = mk_stack()
    params = model.variables['params']
    bstats = model.variables.get('batch_stats', {})
    rng = jax.random.PRNGKey(0)

    # measure first (normal jit path); cost analysis second — its AOT
    # compile can be slow or unsupported, and must not block the numbers
    batch0 = {k: np.asarray(v[0]) for k, v in stacked[0].items()}
    y0 = np.asarray(stacked[1][0])
    res = timing.measure_chunked(chunk_jit, params, bstats, opt_state,
                                 stacked, rng, batch_size, steps_per_chunk,
                                 bench_seconds)
    cost = timing.step_cost_analysis(
        train_step, params, bstats, opt_state,
        batch0, y0, rng) if with_cost else None
    out = {'examples_per_sec': round(res['examples_per_sec'], 1),
           'step_ms': round(res['step_seconds'] * 1e3, 4),
           'batch_size': batch_size, 'finite': res['finite']}
    if cost:
        out['flops_per_step'] = cost['flops']
        out['bytes_per_step'] = cost['bytes']
        rl = timing.roofline(res['step_seconds'], cost['flops'],
                             cost['bytes'])
        if rl.get('known_peaks'):
            out['roofline'] = {
                'device': rl['device_kind'],
                'mxu_bound_ms': round(rl['mxu_bound_ms'], 4),
                'hbm_bound_ms': round(rl['hbm_bound_ms'], 4),
                'bound': rl['bound'],
                'fraction_of_roofline': round(rl['roofline_fraction'], 3),
            }
    return out


def bench_throughput():
    from deeptables_tpu.data.datasets import (load_avazu_synthetic,
                                              load_criteo_synthetic)
    rng = np.random.default_rng(0)
    results = {}

    def emit(name, r):
        results[name] = r
        print(json.dumps({'metric': f'{name}_examples_per_sec', **r}),
              flush=True)

    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=8192 * 8, return_arrays=True)

    # 1. DeepFM / criteo
    emit('criteo_deepfm', _throughput_for(
        ['linear', 'fm_nets', 'dnn_nets'], cat, dense, y, vocab_sizes))

    # 3. xDeepFM / criteo (CIN 128x128); the legacy per-layer Pallas CIN
    # row was removed round 5 with the kernel (two declines — BASELINE.md)
    cin = {'cross_layer_size': (128, 128), 'activation': 'relu'}
    emit('criteo_xdeepfm', _throughput_for(
        ['linear', 'cin_nets', 'dnn_nets'], cat, dense, y, vocab_sizes,
        cin_params=dict(cin)))

    # 2. Wide&Deep + DCN / adult-style (8 cat of modest vocab + 6 dense)
    adult_vocabs = np.asarray([9, 16, 7, 15, 6, 5, 2, 42], np.int64)
    n = 8192 * 8
    cat_ad = np.stack([rng.integers(0, v, n) for v in adult_vocabs],
                      axis=1).astype(np.int32)
    dense_ad = rng.normal(size=(n, 6)).astype(np.float32)
    y_ad = rng.integers(0, 2, n).astype(np.float32)
    emit('adult_widedeep_dcn', _throughput_for(
        ['linear', 'dnn_nets', 'dcn_nets'], cat_ad, dense_ad, y_ad,
        adult_vocabs - 1))

    # 4. AutoInt / avazu-style (22 cat)
    df = load_avazu_synthetic(8192 * 8)
    y_av = df.pop('click').to_numpy(np.float32)
    cat_av = df.to_numpy(np.int64)
    vocabs = cat_av.max(axis=0) + 1
    emit('avazu_autoint', _throughput_for(
        ['autoint_nets'], cat_av.astype(np.int32), None, y_av, vocabs,
        autoint_params={'num_attention': 3, 'num_heads': 2,
                        'dropout_rate': 0, 'use_residual': True}))

    with open(_OUT, 'w') as f:
        json.dump({'method': 'pipelined-fetch scan-chunk (benchmarks/timing)',
                   'throughput': results}, f, indent=1)
    print(f'wrote {_OUT}', flush=True)
    return results


def bench_quality():
    from sklearn.model_selection import train_test_split

    from deeptables_tpu.data.datasets import (load_adult, load_bank,
                                              load_criteo_synthetic)
    from deeptables_tpu.models import DeepTable, ModelConfig

    results = {}

    def run(name, df, target, nets, epochs=8, **kw):
        y = np.asarray(df.pop(target))
        X_train, X_test, y_train, y_test = train_test_split(
            df, y, test_size=0.2, random_state=42, stratify=y)
        conf = ModelConfig(nets=nets, metrics=['AUC', 'logloss'],
                           earlystopping_patience=3, home_dir='/tmp/dt_bench',
                           **kw)
        dt = DeepTable(config=conf)
        t0 = time.time()
        dt.fit(X_train, y_train, epochs=epochs, batch_size=512, verbose=0)
        fit_s = time.time() - t0
        score = dt.evaluate(X_test, y_test, verbose=0)
        results[name] = {'auc': score['AUC'], 'logloss': score['logloss'],
                         'fit_seconds': fit_s}
        print(json.dumps({'metric': f'{name}_auc',
                          'value': round(score['AUC'], 4),
                          'logloss': round(score['logloss'], 4),
                          'fit_seconds': round(fit_s, 1)}), flush=True)

    run('bank_deepfm', load_bank(20000),
        'y', ['linear', 'fm_nets', 'dnn_nets'])
    run('adult_widedeep_dcn', load_adult(20000), 14,
        ['linear', 'dnn_nets', 'dcn_nets'])
    # criteo/avazu synthetic categorical fields are int-coded → must be
    # declared explicitly (auto triage would treat them as numeric and
    # silently skip the CIN/attention nets — round-4 fix)
    criteo = load_criteo_synthetic(60000)
    run('criteo_xdeepfm', criteo, 'label',
        ['linear', 'cin_nets', 'dnn_nets'],
        cin_params={'cross_layer_size': (64, 64), 'activation': 'relu'},
        embeddings_output_dim=8,
        categorical_columns=[f'C{i}' for i in range(1, 27)])
    from deeptables_tpu.data.datasets import load_avazu_synthetic
    avazu = load_avazu_synthetic(60000)
    run('avazu_autoint', avazu, 'click', ['autoint_nets'],
        autoint_params={'num_attention': 3, 'num_heads': 2,
                        'dropout_rate': 0, 'use_residual': True},
        categorical_columns=[c for c in avazu.columns if c != 'click'])
    return results


# ---------------------------------------------------------------------------
# Formulation-regression harness (round 5, VERDICT r4 weak #2 / item 6).
#
# The embedding/CIN hot-path defaults are frozen winners of one
# measurement context, and the k-select verdict REVERSED between rounds 3
# and 4 with no code change (BASELINE.md "Formulation A/B").  This mode
# turns the stated rule "re-measure after major trace changes or jax
# upgrades" into one command: it A/Bs every frozen default in-situ (full
# train step, one subprocess per variant so each formulation freezes into
# its own trace) and prints winner-vs-default with a loud flag when a
# default has gone stale.
#
#   python benchmarks/bench_models.py formulations
# ---------------------------------------------------------------------------

_FORM_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'formulations_results.json')

# (env knob, probe config, [default value, alternatives...])
_FORMULATIONS = [
    ('DT_EMB_KSEL', 'deepfm', ['matmul', 'elementwise']),
    ('DT_EMB_SCATTER', 'deepfm', ['lane', 'logical', 'segsum']),
    # speed probe only — quality-unsafe without an f32 master copy
    # (ops/embedding.py _table_param_dtype); a stale flag here means
    # "worth building the master-copy optimizer", not "flip the env"
    ('DT_EMB_TABLE_BF16', 'deepfm', ['0', '1']),
    ('DT_CIN_BWD', 'xdeepfm', ['pallas', 'bm', 'auto']),
    ('DT_CIN_BWD_CHUNK_F', 'xdeepfm', ['0', 'auto']),
]
# relative margin before a default is flagged stale (tunnel run-to-run
# variance measured ±0.5-1%; 2% keeps the flag quiet on noise)
_STALE_MARGIN = 0.02


def _probe(config_name):
    """Measure ONE full train step config in THIS process (invoked as a
    subprocess by bench_formulations so env knobs freeze into the trace).
    Prints a single JSON line with step_ms."""
    from deeptables_tpu.data.datasets import load_criteo_synthetic
    cat, dense, y, vocab_sizes = load_criteo_synthetic(
        n_rows=8192 * 8, return_arrays=True)
    if config_name == 'deepfm':
        r = _throughput_for(['linear', 'fm_nets', 'dnn_nets'], cat, dense,
                            y, vocab_sizes, with_cost=False)
    elif config_name == 'xdeepfm':
        r = _throughput_for(
            ['linear', 'cin_nets', 'dnn_nets'], cat, dense, y, vocab_sizes,
            with_cost=False,
            cin_params={'cross_layer_size': (128, 128),
                        'activation': 'relu'})
    else:
        raise ValueError(config_name)
    print(json.dumps({'probe': config_name, 'step_ms': r['step_ms']}),
          flush=True)


def _run_probe_subprocess(config_name, env_overrides):
    import subprocess
    env = dict(os.environ)
    env.update(env_overrides)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '_probe', config_name],
        env=env, capture_output=True, text=True, timeout=560)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if 'step_ms' in d:
                return d['step_ms']
        except ValueError:
            continue
    raise RuntimeError(
        f'probe {config_name} {env_overrides} produced no result:\n'
        f'{out.stdout[-2000:]}\n{out.stderr[-2000:]}')


def bench_formulations():
    results = {'stale': [], 'failed': []}
    base_ms = {}  # all-defaults probe, shared across knob groups

    def probe_defaults(probe_cfg):
        # pin EVERY knob of the probe's group (ambient env could carry a
        # sibling override and the A/B would mix two knob changes)
        return {k: v[0] for k, p, v in _FORMULATIONS if p == probe_cfg}

    for knob, probe_cfg, values in _FORMULATIONS:
        default = values[0]
        try:
            if probe_cfg not in base_ms:
                base_ms[probe_cfg] = _run_probe_subprocess(
                    probe_cfg, probe_defaults(probe_cfg))
                print(json.dumps({'probe': probe_cfg, 'all_defaults_ms':
                                  base_ms[probe_cfg]}), flush=True)
            rows = {default: base_ms[probe_cfg]}
            for alt in values[1:]:
                rows[alt] = _run_probe_subprocess(
                    probe_cfg, dict(probe_defaults(probe_cfg), **{knob: alt}))
                print(json.dumps({'knob': knob, 'value': alt,
                                  'step_ms': rows[alt]}), flush=True)
        except Exception as e:  # one slow/broken probe must not discard
            results['failed'].append(knob)  # the completed measurements
            results[knob] = {'probe': probe_cfg, 'error':
                             f'{type(e).__name__}: {str(e)[:300]}'}
            print(f'!!! probe failed for {knob}: {type(e).__name__}',
                  flush=True)
            with open(_FORM_OUT, 'w') as f:
                json.dump(results, f, indent=1)
            continue
        winner = min(rows, key=rows.get)
        stale = (winner != default
                 and rows[winner] < rows[default] * (1 - _STALE_MARGIN))
        results[knob] = {'probe': probe_cfg, 'default': default,
                         'winner': winner, 'step_ms': rows,
                         'stale': stale}
        verdict = (f'*** STALE DEFAULT: {knob}={default} '
                   f'({rows[default]:.3f} ms) loses to {winner} '
                   f'({rows[winner]:.3f} ms) — re-freeze the default ***'
                   if stale else
                   f'{knob}: default {default} holds '
                   f'({rows[default]:.3f} ms; best alt '
                   f'{min(v for k, v in rows.items() if k != default):.3f})')
        if stale:
            results['stale'].append(knob)
        print(verdict, flush=True)
        with open(_FORM_OUT, 'w') as f:  # incremental (tunnel flakes)
            json.dump(results, f, indent=1)
    with open(_FORM_OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print(f'wrote {_FORM_OUT}; stale defaults: '
          f'{results["stale"] or "none"}', flush=True)
    return results


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if mode == '_probe':
        _probe(sys.argv[2])
    elif mode == 'formulations':
        bench_formulations()
    else:
        if mode in ('throughput', 'all'):
            bench_throughput()
        if mode in ('quality', 'all'):
            bench_quality()
