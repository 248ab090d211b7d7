# -*- coding:utf-8 -*-
"""Heterogeneous embedding widths (fixed_embedding_dim=False) — mirrors
reference config_test.py: per-column dims follow min(4*voc^0.25, 20)."""

import numpy as np
import pandas as pd
import pytest

from deeptables_tpu.data.datasets import load_bank
from deeptables_tpu.models import DeepTable, ModelConfig
from deeptables_tpu.models.preprocessor import DefaultPreprocessor
from deeptables_tpu.ops.embedding import plan_groups


class TestVariableEmbeddingDims:
    def test_preprocessor_assigns_var_dims(self):
        from deeptables_tpu.data.datasets import load_adult
        df = load_adult(2000)
        y = df.pop(14)
        conf = ModelConfig(fixed_embedding_dim=False, metrics=['AUC'])
        p = DefaultPreprocessor(conf, use_cache=False)
        p.fit_transform(df, y)
        dims = {c.embeddings_output_dim for c in p.categorical_columns}
        assert len(dims) > 1  # different cardinalities → different widths
        for c in p.categorical_columns:
            assert c.embeddings_output_dim == \
                min(4 * int(pow(c.vocabulary_size, 0.25)), 20)

    def test_grouped_gather_plan(self):
        plan = plan_groups([10, 20, 30, 40], [4, 8, 4, 8])
        assert len(plan) == 2
        dims = [p[0] for p in plan]
        assert dims == [4, 8]
        d4 = plan[0]
        assert d4[1] == [0, 2]  # columns with dim 4, vocab-ascending
        # kernel-aligned layout: each column region starts at a multiple of
        # k*TILE_P = 32*256 = 8192 logical rows
        assert d4[4] is True
        assert list(d4[2]) == [0, 8192]
        assert d4[3] == 16384
        # physical storage is lane-packed
        from deeptables_tpu.ops.embedding import packed_shape
        assert packed_shape(40, 4) == (2, 128)
        assert packed_shape(100, 16) == (13, 128)
        assert packed_shape(100, 200) == (100, 200)  # >128 lanes: unpacked

    def test_plan_compact_fallback_for_tiny_schemas(self):
        # alignment padding too costly relative to the logical size when
        # there are many tiny columns → compact layout, scatter gradients
        plan = plan_groups([10] * 100, [4] * 100)
        dim, cols, offsets, total, aligned = plan[0]
        assert aligned is False
        assert total == 1000
        assert list(offsets[:3]) == [0, 10, 20]

    def test_dnn_trains_with_var_dims(self):
        df = load_bank(400)
        y = df.pop('y')
        conf = ModelConfig(nets=['linear', 'dnn_nets'], metrics=['AUC'],
                           fixed_embedding_dim=False, embedding_dropout=0)
        dt = DeepTable(config=conf)
        _, history = dt.fit(df, y, epochs=1, verbose=0)
        assert 'val_auc' in history.history
        proba = dt.predict_proba(df.head(20))
        assert proba.shape == (20, 2)

    def test_3d_nets_require_uniform_dims(self):
        # fm needs a stacked (B,F,D); heterogeneous widths cannot stack
        from deeptables_tpu.data.datasets import load_adult
        df = load_adult(500)
        y = df.pop(14)
        conf = ModelConfig(nets=['fm_nets'], metrics=['AUC'],
                           fixed_embedding_dim=False, embedding_dropout=0)
        dt = DeepTable(config=conf)
        with pytest.raises(Exception):
            dt.fit(df, y, epochs=1, verbose=0)
