# -*- coding:utf-8 -*-
"""Native ingest: C++ parser vs Python fallback oracle."""

import numpy as np
import pytest

from deeptables_tpu.data import fast_ingest as fi


def _make_tsv(n=100, n_dense=13, n_cat=26, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        label = rng.integers(0, 2)
        dense = [str(rng.integers(0, 1000)) if rng.random() > 0.1 else ''
                 for _ in range(n_dense)]
        cats = [format(rng.integers(0, 2**32), '08x')
                if rng.random() > 0.1 else '' for _ in range(n_cat)]
        lines.append('\t'.join([str(label)] + dense + cats))
    return ('\n'.join(lines) + '\n').encode()


class TestNativeBuild:
    def test_builds(self):
        assert fi.have_native(), 'native library should build with g++'


class TestCriteoParser:
    def test_native_matches_python(self):
        data = _make_tsv(200)
        buckets = [1000 + i for i in range(26)]
        l1, d1, c1 = fi.parse_criteo_tsv(data, hash_buckets=buckets)
        l2, d2, c2 = fi._parse_criteo_py(data, 13, 26,
                                         np.asarray(buckets, np.int64))
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        np.testing.assert_array_equal(c1, c2)

    def test_shapes_and_ranges(self):
        data = _make_tsv(50)
        labels, dense, cats = fi.parse_criteo_tsv(data)
        assert labels.shape == (50,)
        assert dense.shape == (50, 13)
        assert cats.shape == (50, 26)
        assert cats.min() >= 0
        assert set(np.unique(labels)) <= {0.0, 1.0}

    def test_missing_fields(self):
        data = b'1\t\t2\n0\t5\n'
        labels, dense, cats = fi.parse_criteo_tsv(data, n_dense=2, n_cat=1)
        assert labels.tolist() == [1.0, 0.0]
        assert dense[0, 0] == 0.0
        assert abs(dense[0, 1] - np.log1p(2)) < 1e-6
        assert dense[1, 1] == 0.0


class TestNumericCsv:
    def test_parse(self):
        data = b'a,b,c\n1,2.5,3\n4,,6\n'
        out = fi.parse_numeric_csv(data, 3, skip_header=True)
        np.testing.assert_allclose(out, [[1, 2.5, 3], [4, 0, 6]])


class TestCriteoTsvSource:
    def test_chunked_stream(self, tmp_path):
        p = tmp_path / 'day0.tsv'
        data = _make_tsv(300)
        p.write_bytes(data)
        src = fi.CriteoTsvSource([str(p)], chunk_bytes=1024)
        total = 0
        for labels, dense, cats in src.iter_chunks():
            total += len(labels)
            assert dense.shape[1] == 13
        assert total == 300

    def test_host_sharding(self, tmp_path):
        paths = []
        for i in range(4):
            p = tmp_path / f'day{i}.tsv'
            p.write_bytes(_make_tsv(10, seed=i))
            paths.append(str(p))
        s0 = fi.CriteoTsvSource(paths, host_id=0, num_hosts=2)
        s1 = fi.CriteoTsvSource(paths, host_id=1, num_hosts=2)
        assert len(s0.paths) == 2 and set(s0.paths).isdisjoint(s1.paths)
