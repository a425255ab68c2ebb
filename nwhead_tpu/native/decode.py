"""ctypes binding for the first-party C++ JPEG decode worker pool.

Native replacement for the reference's DataLoader worker processes
(``train.py:190-196``): decode happens in C++ threads with persistent
libjpeg state, written straight into preallocated numpy buffers — no PIL,
no GIL on the decode path. Compiled on demand with g++ -O3 (content-hashed
.so cache, like native/hnsw.py).

Two modes:
  * ``JpegDecodePool.decode_batch(paths)`` — full images at native size
    (per-image buffers; probes headers first);
  * ``JpegDecodePool.decode_crop_resize(paths, boxes, out_hw, flips)`` —
    fused decode+crop+bilinear-resize(+horizontal-flip) into one
    (n, H, W, 3) uint8 batch, using libjpeg IDCT-level downscaling (the
    full fractional M/8 ladder under libjpeg-turbo) when the target is
    smaller than the crop — up to 8x less decode work; flips cost nothing
    (mirrored stores during the resize write).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "decode.cpp")
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    for base in (os.path.dirname(__file__), tempfile.gettempdir()):
        so_path = os.path.join(base, f"libjpegpool_{tag}.so")
        if os.path.exists(so_path):
            return so_path
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", so_path, "-ljpeg", "-lpthread"],
                check=True,
                capture_output=True,
            )
            return so_path
        except (subprocess.CalledProcessError, OSError, PermissionError):
            continue
    raise RuntimeError("could not compile decode.cpp (libjpeg required)")


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.jpeg_dims.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_pool_create.restype = ctypes.c_void_p
        lib.decode_pool_create.argtypes = [ctypes.c_int]
        lib.decode_pool_free.argtypes = [ctypes.c_void_p]
        lib.decode_pool_run.restype = ctypes.c_int
        lib.decode_pool_run.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8),  # per-image flip flags
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.decode_pool_run_varied.restype = ctypes.c_int
        lib.decode_pool_run_varied.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    return _LIB


def jpeg_dims(path: str) -> Tuple[int, int]:
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = _lib().jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"failed to read JPEG header: {path}")
    return h.value, w.value


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


class JpegDecodePool:
    """Thread pool of native JPEG decoders."""

    def __init__(self, workers: int = 8) -> None:
        self.workers = max(1, workers)
        self._handle = _lib().decode_pool_create(self.workers)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                _lib().decode_pool_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def decode_batch(self, paths: Sequence[str]) -> List[np.ndarray]:
        """Full images at native size, RGB uint8 (list of (h, w, 3))."""
        n = len(paths)
        dims = [jpeg_dims(p) for p in paths]
        bufs = [np.empty((h, w, 3), np.uint8) for h, w in dims]
        outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
        )
        hs = (ctypes.c_int * n)(*[d[0] for d in dims])
        ws = (ctypes.c_int * n)(*[d[1] for d in dims])
        fails = _lib().decode_pool_run_varied(
            self._handle, _paths_array(paths), n, outs, hs, ws
        )
        if fails:
            raise IOError(f"{fails} of {n} JPEGs failed to decode")
        return bufs

    def decode_crop_resize(
        self,
        paths: Sequence[str],
        boxes: Optional[np.ndarray],
        out_hw: Tuple[int, int],
        flips=None,
    ) -> np.ndarray:
        """Fused decode+crop+resize(+flip): boxes (n, 4) int32 (y, x, h, w)
        in original coordinates (None = whole images); flips an optional
        per-image bool/0-1 sequence applied as a horizontal mirror during
        the native resize write (free — no extra pass); returns
        (n, out_h, out_w, 3) uint8."""
        n = len(paths)
        out_h, out_w = out_hw
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        boxes_ptr = None
        if boxes is not None:
            boxes = np.ascontiguousarray(boxes, np.int32)
            assert boxes.shape == (n, 4)
            boxes_ptr = boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        flips_ptr = None
        if flips is not None:
            flips = np.ascontiguousarray(
                np.asarray(flips, np.uint8).reshape(-1))
            assert flips.shape == (n,)
            flips_ptr = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        fails = _lib().decode_pool_run(
            self._handle, _paths_array(paths), boxes_ptr, flips_ptr, n,
            out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if fails:
            raise IOError(f"{fails} of {n} JPEGs failed to decode")
        return out
