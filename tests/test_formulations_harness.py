# -*- coding:utf-8 -*-
"""Formulation-regression harness logic (benchmarks/bench_models.py
``formulations`` mode) — subprocess probes mocked so the stale-default
detection, env pinning and failure isolation are unit-testable on CPU."""

import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import benchmarks.bench_models as bm  # noqa: E402


def _run(monkeypatch, tmp_path, timings, formulations):
    calls = []

    def fake_probe(cfg, env):
        calls.append((cfg, dict(env)))
        key = tuple(sorted(env.items()))
        return timings[key]

    monkeypatch.setattr(bm, '_run_probe_subprocess', fake_probe)
    monkeypatch.setattr(bm, '_FORMULATIONS', formulations)
    monkeypatch.setattr(bm, '_FORM_OUT', str(tmp_path / 'form.json'))
    res = bm.bench_formulations()
    with open(str(tmp_path / 'form.json')) as f:
        assert json.load(f)['stale'] == res['stale']
    return res, calls


def test_stale_default_flagged(monkeypatch, tmp_path):
    forms = [('K1', 'cfg', ['a', 'b'])]
    timings = {(('K1', 'a'),): 10.0, (('K1', 'b'),): 5.0}
    res, _ = _run(monkeypatch, tmp_path, timings, forms)
    assert res['stale'] == ['K1']
    assert res['K1']['winner'] == 'b'


def test_default_holds_within_margin(monkeypatch, tmp_path):
    forms = [('K1', 'cfg', ['a', 'b'])]
    # 1% better than default — inside the 2% stale margin
    timings = {(('K1', 'a'),): 10.0, (('K1', 'b'),): 9.9}
    res, _ = _run(monkeypatch, tmp_path, timings, forms)
    assert res['stale'] == []


def test_alt_probe_pins_sibling_knobs(monkeypatch, tmp_path):
    """An alternative probe must pin every sibling knob of the same
    probe group to its default (review round-5 finding: ambient env
    could otherwise mix two knob changes into one A/B)."""
    forms = [('K1', 'cfg', ['a', 'b']), ('K2', 'cfg', ['x', 'y'])]
    timings = {
        (('K1', 'a'), ('K2', 'x')): 10.0,           # all defaults
        (('K1', 'b'), ('K2', 'x')): 10.0,           # K1 alt, K2 pinned
        (('K1', 'a'), ('K2', 'y')): 10.0,           # K2 alt, K1 pinned
    }
    res, calls = _run(monkeypatch, tmp_path, timings, forms)
    for cfg, env in calls:
        assert set(env) == {'K1', 'K2'}  # both knobs always pinned
    assert res['stale'] == []


def test_probe_failure_is_isolated(monkeypatch, tmp_path):
    forms = [('K1', 'cfg1', ['a', 'b']), ('K2', 'cfg2', ['x', 'y'])]

    def fake_probe(cfg, env):
        if cfg == 'cfg1':
            raise RuntimeError('probe timed out')
        return {'x': 10.0, 'y': 10.0}[env['K2']]

    monkeypatch.setattr(bm, '_run_probe_subprocess', fake_probe)
    monkeypatch.setattr(bm, '_FORMULATIONS', forms)
    monkeypatch.setattr(bm, '_FORM_OUT', str(tmp_path / 'form.json'))
    res = bm.bench_formulations()
    assert res['failed'] == ['K1']
    assert 'error' in res['K1']
    assert res['K2']['winner'] in ('x', 'y')  # K2 still measured


def test_parity_save_concurrent_writers(monkeypatch, tmp_path):
    """parity_quality._save must not lose rows when two sides write
    concurrently (the round-5 clobber incident): hammer it from two
    threads and require every (config, side, seed) row to survive."""
    import threading
    import benchmarks.parity_quality as pq

    out = str(tmp_path / 'parity.json')
    monkeypatch.setattr(pq, '_OUT', out)

    def writer(side):
        for seed in range(8):
            res = pq._load()
            runs = res.setdefault('cfg', {}).setdefault(side, [])
            runs.append({'auc': seed})
            pq._save(res, 'cfg', side)

    t1 = threading.Thread(target=writer, args=('ours',))
    t2 = threading.Thread(target=writer, args=('tf',))
    t1.start(); t2.start(); t1.join(); t2.join()
    final = pq._load()
    assert len(final['cfg']['ours']) == 8, final['cfg']['ours']
    assert len(final['cfg']['tf']) == 8, final['cfg']['tf']
