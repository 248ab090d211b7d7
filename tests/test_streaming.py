# -*- coding:utf-8 -*-
"""Out-of-core streaming path (the analog of the reference's Dask tests)."""

import os

import numpy as np
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.data.streaming import (ChunkedSource, StreamingDataLoader,
                                           fit_preprocessor_streaming)
from deeptables_tpu.models import DeepModel, ModelConfig
from deeptables_tpu.models.preprocessor import DefaultPreprocessor


@pytest.fixture(scope='module')
def csv_shards(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('shards')
    paths = []
    for i in range(4):
        df = load_bank(300, seed=100 + i)
        p = str(tmp / f'bank_{i}.csv')
        df.to_csv(p, index=False)
        paths.append(p)
    return paths


class TestChunkedSource:
    def test_iter_chunks(self, csv_shards):
        src = ChunkedSource(csv_shards, chunk_size=100)
        chunks = list(src.iter_chunks())
        assert sum(len(c) for c in chunks) == 1200
        assert all(len(c) <= 100 for c in chunks)

    def test_glob_pattern(self, csv_shards):
        pattern = os.path.join(os.path.dirname(csv_shards[0]), '*.csv')
        src = ChunkedSource(pattern, chunk_size=500)
        assert len(src.paths) == 4

    def test_host_sharding(self, csv_shards):
        s0 = ChunkedSource(csv_shards, host_id=0, num_hosts=2)
        s1 = ChunkedSource(csv_shards, host_id=1, num_hosts=2)
        assert len(s0.paths) == 2 and len(s1.paths) == 2
        assert set(s0.paths).isdisjoint(s1.paths)

    def test_sample(self, csv_shards):
        src = ChunkedSource(csv_shards, chunk_size=100)
        sample = src.sample(250)
        assert len(sample) == 250


class TestStreamingTraining:
    def test_fit_from_stream(self, csv_shards):
        config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                             embedding_dropout=0)
        pre = DefaultPreprocessor(config, use_cache=False)
        source = ChunkedSource(csv_shards, chunk_size=200)
        fit_preprocessor_streaming(pre, source, target='y', sample_rows=600)

        train_loader = StreamingDataLoader(source, pre, target='y',
                                           batch_size=64)
        val_loader = StreamingDataLoader(
            ChunkedSource(csv_shards[:1], chunk_size=200), pre, target='y',
            batch_size=64, shuffle_in_chunk=False, drop_remainder=False)

        model = DeepModel(pre.task, len(pre.labels), config,
                          pre.categorical_columns, pre.continuous_columns)
        history = model.fit(train_loader, epochs=2, verbose=0,
                            validation_data=val_loader)
        assert 'loss' in history.history
        assert 'val_auc' in history.history
        assert len(history.history['loss']) == 2
