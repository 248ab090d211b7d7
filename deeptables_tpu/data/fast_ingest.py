# -*- coding:utf-8 -*-
"""Native (C++) data-ingest bindings.

Loads ``native/fast_ingest.cpp`` (multithreaded Criteo-TSV and numeric-CSV
parsers writing straight into the packed batch layout) through ctypes,
compiling it on first use with the system toolchain.  Falls back to a
numpy/pandas implementation when no compiler is available, so the package
works everywhere while large-scale ingest gets the native path.
"""

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_CACHE_DIR = os.environ.get(
    'DEEPTABLES_NATIVE_CACHE',
    os.path.join(tempfile.gettempdir(), 'deeptables_tpu_native'))

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build_library():
    src = os.path.join(_NATIVE_DIR, 'fast_ingest.cpp')
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    out = os.path.join(_CACHE_DIR, 'libfast_ingest.so')
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
           src, '-o', out]
    logger.info(f'building native ingest library: {" ".join(cmd)}')
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_library():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            path = _build_library()
            lib = ctypes.CDLL(path)
            lib.parse_criteo_tsv.restype = ctypes.c_int64
            lib.parse_criteo_tsv.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            lib.parse_numeric_csv.restype = ctypes.c_int64
            lib.parse_numeric_csv.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            _lib = lib
        except Exception as e:
            logger.warning(f'native ingest unavailable ({e}); '
                           f'falling back to numpy parsing')
            _build_failed = True
    return _lib


def have_native():
    return get_library() is not None


def parse_criteo_tsv(data: bytes, n_dense=13, n_cat=26, hash_buckets=None,
                     n_threads=None):
    """Parse Criteo-format TSV bytes → (labels f32 (N,), dense f32
    (N, n_dense) log1p-transformed, cats int32 (N, n_cat) hashed).

    Uses the native multithreaded parser when available.
    """
    if hash_buckets is None:
        hash_buckets = [100_000] * n_cat
    hash_buckets = np.asarray(hash_buckets, np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    n_lines = data.count(b'\n') + (0 if data.endswith(b'\n') else 1)
    lib = get_library()
    if lib is not None:
        labels = np.zeros(n_lines, np.float32)
        dense = np.zeros((n_lines, n_dense), np.float32)
        cats = np.zeros((n_lines, n_cat), np.int32)
        rows = lib.parse_criteo_tsv(
            data, len(data), n_dense, n_cat,
            hash_buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_threads,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_lines)
        return labels[:rows], dense[:rows], cats[:rows]
    return _parse_criteo_py(data, n_dense, n_cat, hash_buckets)


def _fnv1a(token: bytes) -> int:
    h = 1469598103934665603
    for b in token:
        h ^= b
        h = (h * 1099511628211) % (1 << 64)
    return h


def _parse_criteo_py(data, n_dense, n_cat, hash_buckets):
    rows = [ln for ln in data.split(b'\n') if ln.strip()]
    n = len(rows)
    labels = np.zeros(n, np.float32)
    dense = np.zeros((n, n_dense), np.float32)
    cats = np.zeros((n, n_cat), np.int32)
    for i, ln in enumerate(rows):
        parts = ln.rstrip(b'\r').split(b'\t')
        if parts and parts[0]:
            try:
                labels[i] = float(parts[0])
            except ValueError:
                pass
        for j in range(n_dense):
            k = 1 + j
            if k < len(parts) and parts[k]:
                try:
                    dense[i, j] = np.log1p(max(float(parts[k]), 0.0))
                except ValueError:
                    pass
        for j in range(n_cat):
            k = 1 + n_dense + j
            if k < len(parts) and parts[k]:
                cats[i, j] = _fnv1a(parts[k]) % int(hash_buckets[j])
    return labels, dense, cats


def parse_numeric_csv(data: bytes, n_cols: int, skip_header=True,
                      n_threads=None):
    """Parse a numeric CSV → float32 (N, n_cols) matrix."""
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    n_lines = data.count(b'\n') + (0 if data.endswith(b'\n') else 1)
    lib = get_library()
    if lib is not None:
        out = np.zeros((n_lines, n_cols), np.float32)
        rows = lib.parse_numeric_csv(data, len(data), n_cols,
                                     1 if skip_header else 0, n_threads,
                                     out.ctypes.data_as(
                                         ctypes.POINTER(ctypes.c_float)),
                                     n_lines)
        return out[:rows]
    import io
    import pandas as pd
    df = pd.read_csv(io.BytesIO(data),
                     header=0 if skip_header else None)
    return df.to_numpy(np.float32)


class CriteoTsvSource:
    """Streaming source over Criteo-format TSV shards, native-parsed,
    yielding packed (labels, dense, cats) chunks — plugs into the
    out-of-core training path for Criteo-1TB-scale data (BASELINE.json
    config 5)."""

    def __init__(self, paths, n_dense=13, n_cat=26, hash_buckets=None,
                 chunk_bytes=64 << 20, host_id=0, num_hosts=1):
        import glob as _glob
        if isinstance(paths, str):
            paths = sorted(_glob.glob(paths)) or [paths]
        self.paths = list(paths)[host_id::num_hosts]
        self.n_dense = n_dense
        self.n_cat = n_cat
        self.hash_buckets = hash_buckets
        self.chunk_bytes = chunk_bytes

    def iter_chunks(self):
        for path in self.paths:
            with open(path, 'rb') as f:
                carry = b''
                while True:
                    block = f.read(self.chunk_bytes)
                    if not block:
                        if carry.strip():
                            yield parse_criteo_tsv(
                                carry, self.n_dense, self.n_cat,
                                self.hash_buckets)
                        break
                    block = carry + block
                    cut = block.rfind(b'\n')
                    if cut < 0:
                        carry = block
                        continue
                    carry = block[cut + 1:]
                    yield parse_criteo_tsv(block[:cut + 1], self.n_dense,
                                           self.n_cat, self.hash_buckets)
