"""ctypes binding for the first-party C++ HNSW index.

Compiles ``hnsw.cpp`` on demand with g++ -O3 (cached as a .so next to the
source; falls back to a content-hashed path in /tmp if the package dir is
read-only). Interface mirrors the reference's HNSW usage
(``nwhead/utils.py:195-216``): build once over the support bank, then
``index(x) -> (support_features (B*k, d), support_labels (B*k,))`` with the
flat-concat union-support construction the NW head broadcasts batch-wide.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hnsw.cpp")
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    for base in (os.path.dirname(__file__), tempfile.gettempdir()):
        so_path = os.path.join(base, f"libhnsw_{tag}.so")
        if os.path.exists(so_path):
            return so_path
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", so_path],
                check=True,
                capture_output=True,
            )
            return so_path
        except (subprocess.CalledProcessError, OSError, PermissionError):
            continue
    raise RuntimeError("could not compile hnsw.cpp")


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_create.argtypes = [ctypes.c_int] * 4 + [ctypes.c_uint]
        lib.hnsw_add_items.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hnsw_size.restype = ctypes.c_int
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


class HNSWIndex:
    """L2 HNSW over the support bank (ef_construction=100, M=16 — the
    reference's parameters, ``utils.py:206``)."""

    def __init__(
        self,
        data: np.ndarray,
        labels: np.ndarray,
        n_neighbors: int = 20,
        M: int = 16,
        ef_construction: int = 100,
        ef_search: Optional[int] = None,
        seed: int = 100,
    ) -> None:
        lib = _lib()
        self.data = np.ascontiguousarray(data, dtype=np.float32)
        self.labels = np.asarray(labels)
        self.n_neighbors = n_neighbors
        self.ef_search = ef_search if ef_search is not None else max(64, n_neighbors)
        n, self.dim = self.data.shape
        self._handle = lib.hnsw_create(self.dim, n, M, ef_construction, seed)
        lib.hnsw_add_items(
            self._handle,
            self.data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            self.dim,
        )

    def add_items(self, data: np.ndarray, labels: np.ndarray) -> None:
        """Incrementally insert new items (HNSW graphs grow online — the
        same insertion path build uses; no rebuild). Supports
        ``NWNet.add_support``'s bank updates; the reference has no
        incremental path (its index is rebuilt by every ``precompute()``,
        ``nwhead/support.py:132-133``)."""
        new = np.ascontiguousarray(data, dtype=np.float32)
        if new.ndim != 2 or new.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) features, got {new.shape}")
        _lib().hnsw_add_items(
            self._handle,
            new.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            new.shape[0],
            self.dim,
        )
        self.data = np.concatenate([self.data, new], axis=0)
        self.labels = np.concatenate([self.labels, np.asarray(labels)], axis=0)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                _lib().hnsw_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def knn_query(self, x: np.ndarray, k: Optional[int] = None) -> np.ndarray:
        """Neighbor ids (B, k)."""
        k = k or self.n_neighbors
        x = np.ascontiguousarray(x, dtype=np.float32)
        nq = x.shape[0]
        out = np.empty((nq, k), dtype=np.int64)
        _lib().hnsw_search(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq,
            self.dim,
            k,
            max(self.ef_search, k),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out

    def __call__(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Flat-concat union support (reference quirk, ``utils.py:214-215``)."""
        idx = self.knn_query(np.asarray(x))
        flat = idx.reshape(-1)
        return self.data[flat], self.labels[flat]
