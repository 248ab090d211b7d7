# -*- coding:utf-8 -*-
"""Low-latency inference serving.

The reference serves predictions through ``DeepTable.predict_proba`` (full
estimator + Keras session).  For production serving this module provides a
lean path: a :class:`Predictor` that loads a saved DeepTable/DeepModel,
freezes the preprocessing pipeline, compiles fixed-shape jitted forwards per
batch bucket (padding inputs up to the bucket), and serves numpy in → numpy
out with no Python-side graph work per request.
"""

import math
import pickle
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data import pipeline
from .models.deepmodel import DeepModel, probas_from_logits
from .models.deeptable import DeepTable, fix_binary_predict_proba_result
from .utils import consts, dt_logging

logger = dt_logging.get_logger(__name__)

DEFAULT_BUCKETS = (1, 8, 64, 512, 4096)


class Predictor:
    """Compiled fixed-shape predictor over a fitted DeepTable.

    - input rows are padded up to the smallest batch bucket, so every
      request hits an already-compiled XLA executable;
    - ``warmup()`` pre-compiles all buckets;
    - binary outputs follow the estimator convention ((n, 2) probas).
    """

    def __init__(self, deeptable: DeepTable, model_selector=consts.MODEL_SELECTOR_CURRENT,
                 batch_buckets: Sequence[int] = DEFAULT_BUCKETS):
        self.dt = deeptable
        self.preprocessor = deeptable.preprocessor
        self.model: DeepModel = deeptable.get_model(model_selector)
        self.model.build()
        self.task = deeptable.task
        self.buckets = sorted(set(int(b) for b in batch_buckets))
        self._fns: Dict[int, object] = {}
        module = self.model.module

        def forward(variables, batch):
            logits, _ = module.apply(variables, batch, training=False)
            return probas_from_logits(logits, self.task)

        self._forward = jax.jit(forward)

    @classmethod
    def load(cls, filepath, **kwargs):
        return cls(DeepTable.load(filepath), **kwargs)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return int(math.ceil(n / self.buckets[-1]) * self.buckets[-1])

    def warmup(self):
        """Pre-compile every batch bucket."""
        cats = self.model.categorical_columns
        conts = self.model.continuous_columns
        for b in self.buckets:
            batch = {}
            if cats:
                batch[pipeline.CAT_KEY] = np.zeros((b, len(cats)), np.int32)
            for g in conts:
                batch[g.name] = np.zeros((b, g.input_dim), np.float32)
            for c in self.model.var_len_categorical_columns:
                batch[c.name] = np.zeros((b, c.max_elements_length or 1),
                                         np.int32)
            jax.block_until_ready(
                self._forward(self.model.variables, batch))
        logger.info(f'warmed up buckets {self.buckets}')
        return self

    def predict_proba(self, X) -> np.ndarray:
        """DataFrame (raw feature space) → probability matrix."""
        X_t = self.preprocessor.transform_X(X)
        arrays = pipeline.extract_arrays(
            X_t, self.model.categorical_columns,
            self.model.continuous_columns,
            self.model.var_len_categorical_columns)
        return self.predict_proba_arrays(arrays, len(X))

    def predict_proba_arrays(self, arrays: Dict[str, np.ndarray],
                             n: Optional[int] = None) -> np.ndarray:
        """Pre-packed arrays → probability matrix (hot serving path)."""
        if n is None:
            n = len(next(iter(arrays.values())))
        bucket = self._bucket_for(n)
        outs = []
        for start in range(0, n, bucket):
            count = min(bucket, n - start)
            chunk = {}
            for k, v in arrays.items():
                part = v[start:start + count]
                if count < bucket:
                    pad = np.zeros((bucket - count,) + part.shape[1:],
                                   part.dtype)
                    part = np.concatenate([part, pad])
                chunk[k] = part
            proba = np.asarray(self._forward(self.model.variables, chunk))
            outs.append(proba[:count])
        proba = np.concatenate(outs)
        if self.task == consts.TASK_BINARY:
            proba = fix_binary_predict_proba_result(proba)
        return proba

    def predict(self, X, encode_to_label=True):
        proba = self.predict_proba(X)
        return self.dt.proba2predict(proba, encode_to_label=encode_to_label)


def export_predictor(deeptable: DeepTable, filepath: str):
    """Persist estimator for serving (same layout as DeepTable.save)."""
    deeptable.save(filepath)
    return filepath
