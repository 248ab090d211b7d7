# -*- coding:utf-8 -*-
"""Out-of-core streaming input pipeline.

Capability parity with the reference's Dask path
(``DefaultDaskPreprocessor`` preprocessor.py:518-598 + the chunked
Dask→tf.data generator with 2-thread prefetch, dataset_generator.py:171-238):
train on datasets larger than host memory by streaming file shards.

TPU-native design (SURVEY.md §2.2): no cluster — a chunked reader over
CSV/Parquet shards, a preprocessor fitted on a bounded sample (or full
streaming pass), and a double-buffered loader thread that keeps the next
chunk's batches ready while the device trains on the current ones.
Multi-host execution shards the *file list* per host (every host reads a
disjoint subset), which is the standard JAX multi-host data recipe.
"""

import concurrent.futures
import glob as _glob
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from . import pipeline
from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)


class ChunkedSource:
    """Iterate (host-sharded) CSV/Parquet files as DataFrame chunks."""

    def __init__(self, paths: Union[str, Sequence[str]],
                 chunk_size: int = 100_000,
                 host_id: int = 0, num_hosts: int = 1):
        if isinstance(paths, str):
            paths = sorted(_glob.glob(paths)) or [paths]
        self.paths: List[str] = list(paths)
        if num_hosts > 1:
            # per-host disjoint file shards (multi-host data loading)
            self.paths = self.paths[host_id::num_hosts]
        self.chunk_size = chunk_size

    def iter_chunks(self) -> Iterator[pd.DataFrame]:
        for path in self.paths:
            if path.endswith('.parquet'):
                df = pd.read_parquet(path)
                for s in range(0, len(df), self.chunk_size):
                    yield df.iloc[s:s + self.chunk_size]
            else:
                for chunk in pd.read_csv(path, chunksize=self.chunk_size):
                    yield chunk

    def sample(self, n_rows: int) -> pd.DataFrame:
        """First-n sample used to fit the preprocessor (bounded memory)."""
        parts = []
        total = 0
        for chunk in self.iter_chunks():
            parts.append(chunk)
            total += len(chunk)
            if total >= n_rows:
                break
        if not parts:
            raise ValueError('source produced no data')
        return pd.concat(parts).head(n_rows)


class StreamingDataLoader:
    """Stream (batch, y, w, valid) tuples from a chunked source through a
    fitted preprocessor, with one chunk of lookahead prefetched on a worker
    thread (the analog of the reference's ThreadPoolExecutor(2) prefetch,
    dataset_generator.py:177).

    Implements the same protocol as ``pipeline.BatchIterator`` (iteration +
    ``steps``), so ``DeepModel.fit`` accepts it directly as ``X``.
    """

    def __init__(self, source: ChunkedSource, preprocessor, target: str,
                 batch_size: int = 512, shuffle_chunks: bool = True,
                 shuffle_in_chunk: bool = True, drop_remainder: bool = True,
                 pad_multiple: int = 1, steps_per_epoch: Optional[int] = None,
                 seed: int = 0):
        self.source = source
        self.preprocessor = preprocessor
        self.target = target
        self.batch_size = batch_size
        self.shuffle_chunks = shuffle_chunks
        self.shuffle_in_chunk = shuffle_in_chunk
        self.drop_remainder = drop_remainder
        self.pad_multiple = pad_multiple
        self._steps_per_epoch = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    @property
    def steps(self):
        if self._steps_per_epoch is None:
            # one counting pass (cheap: row counts only)
            total = sum(len(c) for c in self.source.iter_chunks())
            self._steps_per_epoch = max(total // self.batch_size, 1)
        return self._steps_per_epoch

    def _chunk_to_batches(self, chunk: pd.DataFrame, rng):
        y_raw = chunk[self.target]
        X = chunk.drop(columns=[self.target])
        X_t = self.preprocessor.transform_X(X)
        y_t = self.preprocessor.transform_y(y_raw)
        arrays = pipeline.extract_arrays(
            X_t, self.preprocessor.categorical_columns,
            self.preprocessor.continuous_columns,
            self.preprocessor.var_len_categorical_columns)
        labels = self.preprocessor.labels
        num_classes = len(labels) if labels is not None else 0
        y_arr = pipeline.prepare_labels(y_t, self.preprocessor.task,
                                        num_classes)
        it = pipeline.BatchIterator(
            arrays, y_arr, None, batch_size=self.batch_size,
            shuffle=self.shuffle_in_chunk,
            drop_remainder=self.drop_remainder,
            pad_multiple=self.pad_multiple,
            seed=int(rng.integers(0, 2 ** 31)))
        return list(it)

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        chunks = self.source.iter_chunks()

        # pipeline: transform the next chunk on a worker thread while the
        # trainer consumes batches of the current one
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            pending = None
            for chunk in chunks:
                fut = pool.submit(self._chunk_to_batches, chunk, rng)
                if pending is not None:
                    for item in pending.result():
                        yield item
                pending = fut
            if pending is not None:
                for item in pending.result():
                    yield item


def fit_preprocessor_streaming(preprocessor, source: ChunkedSource,
                               target: str, sample_rows: int = 500_000):
    """Fit a DefaultPreprocessor on a bounded sample of the stream.

    The reference's Dask preprocessor computes exact statistics on the
    cluster; with a single-host stream the fit statistics (vocabularies,
    means, bins) come from the first ``sample_rows`` rows — unseen categories
    at transform time route to the reserved unseen bucket.
    """
    sample = source.sample(sample_rows)
    y = sample[target]
    X = sample.drop(columns=[target])
    preprocessor.fit_transform(X, y)
    return preprocessor
