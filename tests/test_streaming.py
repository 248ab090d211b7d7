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


class TestExactStreamingFit:
    """The two-pass streaming fit must produce the same pipeline state as an
    in-memory fit over the concatenated stream (VERDICT r2 #6; the analog of
    the reference Dask preprocessor's exact cluster statistics)."""

    @pytest.fixture(scope='class')
    def messy_shards(self, tmp_path_factory):
        import pandas as pd
        tmp = tmp_path_factory.mktemp('messy')
        rng = np.random.default_rng(7)
        paths, frames = [], []
        for i in range(3):
            n = 400
            df = pd.DataFrame({
                'cat_a': rng.choice(['x', 'y', 'z', 'w'], n),
                'cat_b': rng.choice(list('abcdefgh'), n),
                'num_1': rng.normal(10, 3, n),
                'num_2': rng.integers(0, 2000, n).astype(float),
                'small_int': rng.integers(0, 5, n).astype(float),
                'y': rng.choice(['no', 'yes'], n),
            })
            # inject NaNs into a categorical and a continuous column
            df.loc[df.sample(30, random_state=i).index, 'cat_a'] = np.nan
            df.loc[df.sample(25, random_state=i + 9).index, 'num_1'] = np.nan
            p = str(tmp / f'part_{i}.csv')
            df.to_csv(p, index=False)
            # read back so dtype round-trips identically to the stream
            frames.append(pd.read_csv(p))
            paths.append(p)
        return paths, pd.concat(frames, ignore_index=True)

    def _config(self):
        return ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                           auto_categorize=True, auto_discrete=True,
                           auto_scale=True, embedding_dropout=0)

    def test_stats_match_inmemory(self, messy_shards):
        paths, full = messy_shards
        config = self._config()

        pre_s = DefaultPreprocessor(config, use_cache=False)
        fit_preprocessor_streaming(
            pre_s, ChunkedSource(paths, chunk_size=150), target='y')

        pre_m = DefaultPreprocessor(config, use_cache=False)
        y_full = full['y']
        X_full = full.drop(columns=['y'])
        X_mem, y_mem = pre_m.fit_transform(X_full.copy(), y_full.copy())

        # identical task/labels and column metainfo
        assert pre_s.task == pre_m.task
        assert list(pre_s.labels) == list(pre_m.labels)
        assert [(c.name, c.vocabulary_size, c.embeddings_output_dim)
                for c in pre_s.categorical_columns] == \
               [(c.name, c.vocabulary_size, c.embeddings_output_dim)
                for c in pre_m.categorical_columns]
        assert pre_s.get_continuous_columns() == pre_m.get_continuous_columns()
        assert list(pre_s.X_transformers) == list(pre_m.X_transformers)

        # identical transforms of a held-out-like chunk
        X_s = pre_s.transform_X(X_full.copy())
        X_m = pre_m.transform_X(X_full.copy())
        assert list(X_s.columns) == list(X_m.columns)
        for c in X_s.columns:
            a = X_s[c].to_numpy()
            b = X_m[c].to_numpy()
            if a.dtype.kind in 'fc':
                np.testing.assert_allclose(
                    a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12,
                    err_msg=f'column {c}')
            else:
                assert (a == b).all(), f'column {c}'
        np.testing.assert_array_equal(pre_s.transform_y(y_full),
                                      np.asarray(y_mem))

    def test_streaming_e2e_with_eval(self, messy_shards):
        paths, full = messy_shards
        config = self._config()
        pre = DefaultPreprocessor(config, use_cache=False)
        source = ChunkedSource(paths, chunk_size=150)
        fit_preprocessor_streaming(pre, source, target='y')

        train_loader = StreamingDataLoader(source, pre, target='y',
                                           batch_size=64)
        eval_loader = StreamingDataLoader(
            ChunkedSource(paths[:1], chunk_size=150), pre, target='y',
            batch_size=64, shuffle_in_chunk=False, drop_remainder=False)
        model = DeepModel(pre.task, len(pre.labels), config,
                          pre.categorical_columns, pre.continuous_columns)
        model.fit(train_loader, epochs=1, verbose=0)
        result = model.evaluate(eval_loader)
        assert 'auc' in result and np.isfinite(result['loss'])
        proba = model.predict(eval_loader)
        assert proba.shape[0] == 400


class TestStreamingCV:
    def test_fold_masks_partition(self, csv_shards):
        config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                             embedding_dropout=0)
        pre = DefaultPreprocessor(config, use_cache=False)
        src = ChunkedSource(csv_shards, chunk_size=170)
        fit_preprocessor_streaming(pre, src, target='y')
        # every row lands in exactly one fold's valid split
        total = sum(len(c) for c in src.iter_chunks())
        valid_counts = 0
        for fold in range(3):
            ld = StreamingDataLoader(src, pre, target='y', batch_size=32,
                                     shuffle_in_chunk=False,
                                     drop_remainder=False,
                                     fold_spec=(3, fold, 'valid'))
            n = sum(int(valid) for _b, _y, _w, valid in ld)
            train_ld = StreamingDataLoader(src, pre, target='y',
                                           batch_size=32,
                                           shuffle_in_chunk=False,
                                           drop_remainder=False,
                                           fold_spec=(3, fold, 'train'))
            n_train = sum(int(valid) for _b, _y, _w, valid in train_ld)
            assert n + n_train == total
            valid_counts += n
        assert valid_counts == total

    def test_cv_streaming_e2e(self, csv_shards):
        from deeptables_tpu.models import DeepTable
        config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                             embedding_dropout=0,
                             earlystopping_patience=0)
        dt = DeepTable(config=config)
        src = ChunkedSource(csv_shards, chunk_size=300)
        scores = dt.fit_cross_validation_streaming(
            src, target='y', num_folds=3, batch_size=64, epochs=1,
            verbose=0)
        assert len(scores) == 3
        assert all(np.isfinite(s['loss']) for s in scores)
        assert all('auc' in s for s in scores)
        assert dt.leaderboard is not None and len(dt.leaderboard) == 3


def test_deeptable_streaming_fit_and_evaluate(csv_shards):
    """DeepTable.fit/evaluate accept streaming loaders end-to-end."""
    from deeptables_tpu.models import DeepTable
    config = ModelConfig(nets=['linear', 'dnn_nets'], metrics=['AUC'],
                         embedding_dropout=0, earlystopping_patience=0)
    pre = DefaultPreprocessor(config, use_cache=False)
    src = ChunkedSource(csv_shards, chunk_size=300)
    fit_preprocessor_streaming(pre, src, target='y')
    train_loader = StreamingDataLoader(src, pre, target='y', batch_size=64)
    eval_loader = StreamingDataLoader(
        ChunkedSource(csv_shards[:1], chunk_size=300), pre, target='y',
        batch_size=64, shuffle_in_chunk=False, drop_remainder=False)

    dt = DeepTable(config=config)
    _, history = dt.fit(train_loader, epochs=1, verbose=0)
    assert 'loss' in history.history
    result = dt.evaluate(eval_loader)
    assert 'auc' in result and np.isfinite(result['loss'])


def test_streaming_int_category_and_bool_columns():
    """Streaming analog of test_int_category_and_bool_columns: the same
    dataset must get the same imputer fills (hence vocabularies) whether it
    is fit in-memory or streamed (ADVICE r3: resolved_dtype collapsed
    bool/int-category to 'object', giving them the '' fill when streamed).
    In-memory DataFrame chunks preserve the bool/Categorical dtypes (the
    parquet round-trip in this environment does not)."""
    import pandas as pd
    rng = np.random.default_rng(0)
    n = 300
    df = pd.DataFrame({
        'c_int': pd.Categorical(rng.integers(0, 7, n)),
        'c_str': pd.Categorical(
            rng.choice(['a', 'b', 'c'], n).astype(object)),
        'flag': rng.integers(0, 2, n).astype(bool),
        'x': rng.normal(size=n),
        'y': rng.integers(0, 2, n),
    })

    config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'])
    pre_s = DefaultPreprocessor(config, use_cache=False)
    fit_preprocessor_streaming(pre_s, ChunkedSource(df, chunk_size=100),
                               target='y')
    pre_m = DefaultPreprocessor(config, use_cache=False)
    X_mem, _ = pre_m.fit_transform(df.drop(columns=['y']).copy(),
                                   df['y'].copy())

    # same schema/vocabularies as the in-memory fit
    cats_s = [(c.name, c.vocabulary_size) for c in pre_s.categorical_columns]
    cats_m = [(c.name, c.vocabulary_size) for c in pre_m.categorical_columns]
    assert cats_s == cats_m
    X_s = pre_s.transform_X(df.drop(columns=['y']).copy())
    for c in [c.name for c in pre_s.categorical_columns]:
        assert np.issubdtype(X_s[c].dtype, np.integer)
        np.testing.assert_array_equal(np.asarray(X_s[c]),
                                      np.asarray(X_mem[c]))


def test_streaming_chunked_dispatch_matches_per_step(csv_shards):
    """The round-5 scan-chunked loader path (train_steps_per_dispatch on
    a StreamingDataLoader) runs the SAME math as per-step dispatch: final
    params bit-match when shuffling is deterministic."""
    import jax

    def run(n):
        config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                             embedding_dropout=0, seed=11,
                             train_steps_per_dispatch=n)
        pre = DefaultPreprocessor(config, use_cache=False)
        source = ChunkedSource(csv_shards, chunk_size=200)
        fit_preprocessor_streaming(pre, source, target='y', sample_rows=600)
        loader = StreamingDataLoader(source, pre, target='y', batch_size=64,
                                     seed=3)
        model = DeepModel(pre.task, len(pre.labels), config,
                          pre.categorical_columns, pre.continuous_columns)
        h = model.fit(loader, epochs=2, verbose=0)
        return h.history['loss'], model.variables['params']

    l1, p1 = run(1)
    l4, p4 = run(4)
    np.testing.assert_allclose(l1, l4, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_streaming_chunked_dispatch_partial_tail(csv_shards):
    """With drop_remainder=False the loader yields a padded partial tail
    batch; the chunked path must flush its buffer and run that batch
    per-step (order-preserving), not stack it."""
    config = ModelConfig(nets=['dnn_nets'], metrics=['AUC'],
                         embedding_dropout=0, seed=11,
                         train_steps_per_dispatch=4)
    pre = DefaultPreprocessor(config, use_cache=False)
    source = ChunkedSource(csv_shards, chunk_size=250)
    fit_preprocessor_streaming(pre, source, target='y', sample_rows=600)
    loader = StreamingDataLoader(source, pre, target='y', batch_size=64,
                                 drop_remainder=False, seed=3)
    model = DeepModel(pre.task, len(pre.labels), config,
                      pre.categorical_columns, pre.continuous_columns)
    h = model.fit(loader, epochs=1, verbose=0)
    assert np.isfinite(h.history['loss'][0])
