# -*- coding:utf-8 -*-
"""End-to-end Criteo-style path: native TSV ingest → streaming loader →
sharded-table DeepFM training on the 8-device mesh (BASELINE config 5)."""

import jax
import numpy as np
import pytest

from deeptables_tpu.data.criteo import (CriteoStreamLoader, criteo_columns)
from deeptables_tpu.data.fast_ingest import CriteoTsvSource
from deeptables_tpu.models import DeepModel, ModelConfig
from deeptables_tpu.parallel import DataAndModelParallel

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _write_shards(tmp_path, n_shards=2, rows=400, n_dense=4, n_cat=3,
                  seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for s in range(n_shards):
        lines = []
        for _ in range(rows):
            label = rng.integers(0, 2)
            dense = [str(rng.integers(0, 100)) for _ in range(n_dense)]
            cats = [format(rng.integers(0, 2 ** 20), 'x')
                    for _ in range(n_cat)]
            lines.append('\t'.join([str(label)] + dense + cats))
        p = tmp_path / f'day_{s}.tsv'
        p.write_text('\n'.join(lines) + '\n')
        paths.append(str(p))
    return paths


class TestCriteoEndToEnd:
    def test_stream_train(self, tmp_path):
        n_dense, n_cat = 4, 3
        buckets = [64, 128, 256]
        paths = _write_shards(tmp_path, n_dense=n_dense, n_cat=n_cat)
        source = CriteoTsvSource(paths, n_dense=n_dense, n_cat=n_cat,
                                 hash_buckets=buckets, chunk_bytes=4096)
        loader = CriteoStreamLoader(source, batch_size=64)
        cats, conts = criteo_columns(buckets, emb_dim=4, n_dense=n_dense)
        config = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                             metrics=['AUC'], task='binary',
                             embedding_dropout=0, home_dir='/tmp/dt_test')
        model = DeepModel('binary', 2, config, cats, conts)
        history = model.fit(loader, epochs=1, verbose=0)
        assert np.isfinite(history.history['loss'][0])

    @requires_8
    def test_stream_train_sharded_tables(self, tmp_path):
        n_dense, n_cat = 4, 3
        buckets = [64, 128, 256]  # divisible by model axis 2
        paths = _write_shards(tmp_path, n_dense=n_dense, n_cat=n_cat, seed=1)
        source = CriteoTsvSource(paths, n_dense=n_dense, n_cat=n_cat,
                                 hash_buckets=buckets, chunk_bytes=8192)
        strategy = DataAndModelParallel(data_parallel=4, model_parallel=2)
        loader = CriteoStreamLoader(source, batch_size=64,
                                    pad_multiple=4)
        cats, conts = criteo_columns(buckets, emb_dim=4, n_dense=n_dense)
        config = ModelConfig(nets=['linear', 'fm_nets', 'dnn_nets'],
                             metrics=['AUC'], task='binary',
                             embedding_dropout=0,
                             distribute_strategy=strategy,
                             embedding_device_strategy='sharded',
                             home_dir='/tmp/dt_test')
        model = DeepModel('binary', 2, config, cats, conts)
        history = model.fit(loader, epochs=1, verbose=0)
        assert np.isfinite(history.history['loss'][0])
