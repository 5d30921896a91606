"""ctypes bindings for the native host runtime (`graphlib.cpp`).

Builds on first use with g++ (no pybind11 in the image). Every entry point
has a documented pure-Python fallback so the framework degrades gracefully
on systems without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libgraphlib.so"
_lib = None


def build(force=False):
    """Compile graphlib.cpp -> libgraphlib.so."""
    src = _HERE / "graphlib.cpp"
    if _LIB_PATH.exists() and not force and \
            _LIB_PATH.stat().st_mtime > src.stat().st_mtime:
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.graph_neighbors.argtypes = [i64p, i64p, ctypes.c_int64, i64p, i64p]
    lib.edge_capacity.restype = ctypes.c_int64
    lib.edge_capacity.argtypes = [ctypes.c_int64] * 3
    lib.retrieval_create.restype = ctypes.c_void_p
    lib.retrieval_destroy.argtypes = [ctypes.c_void_p]
    lib.retrieval_insert.argtypes = [ctypes.c_void_p, ctypes.c_int32, u8p,
                                     ctypes.c_int64]
    lib.retrieval_query.restype = ctypes.c_int32
    lib.retrieval_query.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64,
                                    ctypes.c_int32, f32p]
    lib.hamming_match.restype = ctypes.c_int64
    lib.hamming_match.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64,
                                  ctypes.c_int32, i32p, i32p, ctypes.c_int64]
    _lib = lib
    return lib


def neighbors(kk, jj):
    """Host-side neighbor links (C++; numpy fallback mirrors ops.segment)."""
    kk = np.ascontiguousarray(kk, np.int64)
    jj = np.ascontiguousarray(jj, np.int64)
    n = len(kk)
    ix = np.empty(n, np.int64)
    jx = np.empty(n, np.int64)
    lib = get_lib()
    if lib is not None:
        lib.graph_neighbors(
            kk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            jj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            ix.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            jx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return ix, jx
    # fallback: python
    ix[:] = -1
    jx[:] = -1
    from collections import defaultdict
    groups = defaultdict(list)
    for e in range(n):
        groups[kk[e]].append(e)
    for idx in groups.values():
        idx.sort(key=lambda e: jj[e])
        for r, e in enumerate(idx):
            ix[e] = idx[r - 1] if r > 0 else -1
            jx[e] = idx[r + 1] if r < len(idx) - 1 else -1
    return ix, jx


def to_binary_codes(desc):
    """Float descriptors [N, D>=256... or any D] -> 256-bit LSH sign codes.

    Uses a fixed random projection so codes are comparable across calls.
    """
    desc = np.asarray(desc, np.float32)
    n, d = desc.shape
    rng = np.random.default_rng(12345)
    proj = rng.standard_normal((d, 256)).astype(np.float32)
    bits = (desc @ proj) > 0
    return np.packbits(bits, axis=1)        # [N, 32] uint8


class BinaryRetrieval:
    """DBoW2-style inverted-file retrieval over binary codes (C++ backend).

    Counterpart of the reference DPRetrieval module
    (`DPRetrieval/src/main.cpp:65-138`): insert_image adds an image's
    descriptors to the database; query returns the best match at least
    `rad` frames older.
    """

    def __init__(self, rad=50):
        self.rad = rad
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native graphlib unavailable")
        self.db = self.lib.retrieval_create()
        self.codes = {}

    def insert_image(self, image_id, desc):
        codes = to_binary_codes(desc)
        self.codes[image_id] = codes
        self.lib.retrieval_insert(
            self.db, image_id,
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(codes))

    def query(self, image_id):
        """Best match j with j <= image_id - rad; returns (j, score,
        matches) where matches are mutual-NN hamming pairs."""
        codes = self.codes[image_id]
        score = ctypes.c_float(0)
        j = self.lib.retrieval_query(
            self.db, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(codes), image_id - self.rad, ctypes.byref(score))
        if j < 0:
            return None, 0.0, None
        cj = self.codes[j]
        idx0 = np.empty(len(codes), np.int32)
        idx1 = np.empty(len(codes), np.int32)
        m = self.lib.hamming_match(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(codes),
            cj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(cj),
            80, idx0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idx1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(codes))
        return int(j), float(score.value), (idx0[:m], idx1[:m])

    def close(self):
        if self.db:
            self.lib.retrieval_destroy(self.db)
            self.db = None
