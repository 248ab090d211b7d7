# -*- coding:utf-8 -*-
"""Criteo-scale end-to-end pipeline glue.

Connects the native TSV parser (`fast_ingest.CriteoTsvSource`) to the
training loop: packed (labels, dense, cats) chunks → shuffled fixed-shape
batches, one chunk of worker-thread lookahead — the BASELINE.json config-5
path ("multi-host sharded-table DeepFM on Criteo-1TB-scale data"): each
host streams its disjoint file shards, tables row-shard over the mesh.
"""

import concurrent.futures
from typing import Optional, Sequence

import numpy as np

from .fast_ingest import CriteoTsvSource
from ..models.metainfo import CategoricalColumn, ContinuousColumn
from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)

CAT_KEY = 'cat'
DENSE_KEY = 'input_continuous_all'


def criteo_columns(hash_buckets: Sequence[int], emb_dim: int = 16,
                   n_dense: int = 13):
    """(categorical_columns, continuous_columns) for a hashed Criteo schema."""
    cats = tuple(CategoricalColumn(f'C{i + 1}', int(b), emb_dim)
                 for i, b in enumerate(hash_buckets))
    conts = (ContinuousColumn(DENSE_KEY,
                              [f'I{i + 1}' for i in range(n_dense)]),)
    return cats, conts


class CriteoStreamLoader:
    """Batch source over Criteo TSV shards (DeepModel.fit-compatible)."""

    def __init__(self, source: CriteoTsvSource, batch_size: int = 8192,
                 shuffle: bool = True, drop_remainder: bool = True,
                 pad_multiple: int = 1,
                 steps_per_epoch: Optional[int] = None, seed: int = 0):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.pad_multiple = max(pad_multiple, 1)
        self._steps = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    @property
    def steps(self):
        if self._steps is None:
            total = 0
            for labels, _, _ in self.source.iter_chunks():
                total += len(labels)
            self._steps = max(total // self.batch_size, 1)
        return self._steps

    def _chunk_batches(self, chunk, rng):
        labels, dense, cats = chunk
        n = len(labels)
        idx = np.arange(n)
        if self.shuffle:
            rng.shuffle(idx)
        out = []
        bs = self.batch_size
        n_full = n // bs if self.drop_remainder else -(-n // bs)
        for s in range(max(n_full, 0)):
            sel = idx[s * bs:(s + 1) * bs]
            valid = len(sel)
            if valid < bs and self.drop_remainder:
                break
            pad = 0
            if valid % self.pad_multiple != 0:
                pad = self.pad_multiple - valid % self.pad_multiple
                sel = np.concatenate([sel, np.zeros(pad, sel.dtype)])
            batch = {CAT_KEY: cats[sel], DENSE_KEY: dense[sel]}
            yb = labels[sel]
            wb = None
            if pad > 0:
                wb = np.ones(len(sel), np.float32)
                wb[valid:] = 0.0
            out.append((batch, yb, wb, valid))
        return out

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            pending = None
            for chunk in self.source.iter_chunks():
                fut = pool.submit(self._chunk_batches, chunk, rng)
                if pending is not None:
                    for item in pending.result():
                        yield item
                pending = fut
            if pending is not None:
                for item in pending.result():
                    yield item
