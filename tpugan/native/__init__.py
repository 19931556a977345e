"""Native (C++) host ops with transparent numpy fallback.

``batch_gather(images, idx, flip=None)`` assembles a training batch from the
decoded uint8 dataset — the hot host-side op of the input pipeline.  The C++
implementation (imageops.cpp, built on first use by build_native.py) is
multithreaded and copy-minimal; when the toolchain or binary is unavailable
the numpy fallback keeps everything working.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False
_THREADS = min(8, os.cpu_count() or 1)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    so = os.path.join(here, "libtpugan_imageops.so")
    try:
        # build() is mtime-guarded: a no-op when the .so is current, a
        # rebuild when imageops.cpp changed (loading a stale binary would
        # silently ignore source edits), a fresh build when absent.
        from tpugan.native.build_native import build

        build()
    except Exception:
        if not os.path.exists(so):  # no toolchain and no binary: fallback
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.tpugan_batch_gather_u8.restype = ctypes.c_int
        lib.tpugan_batch_gather_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.tpugan_normalize_u8_f32.restype = ctypes.c_int
        lib.tpugan_normalize_u8_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def batch_gather(images: np.ndarray, idx: np.ndarray,
                 flip: Optional[np.ndarray] = None) -> np.ndarray:
    """out[i] = images[idx[i]], horizontally flipped where flip[i]."""
    assert images.dtype == np.uint8 and images.ndim == 4
    idx = np.ascontiguousarray(idx, np.int64)
    n = len(idx)
    n_img, h, w, c = images.shape
    # One bounds contract for both paths: numpy semantics (negatives wrap,
    # out-of-range raises).  Without this the C++ path would read unowned
    # memory where the numpy fallback raises IndexError.
    if n and (idx.min() < -n_img or idx.max() >= n_img):
        raise IndexError(
            f"batch_gather index out of range for {n_img} images: "
            f"[{idx.min()}, {idx.max()}]")
    if n and idx.min() < 0:
        idx = idx % n_img
    lib = _load()
    if lib is None or not images.flags.c_contiguous:
        out = images[idx]  # fancy indexing: already a fresh writable array
        if flip is not None:
            sel = flip.astype(bool)
            out[sel] = out[sel, :, ::-1, :]
        return out
    out = np.empty((n, h, w, c), np.uint8)
    fptr = None
    if flip is not None:
        flip = np.ascontiguousarray(flip, np.uint8)
        fptr = flip.ctypes.data
    rc = lib.tpugan_batch_gather_u8(
        images.ctypes.data, idx.ctypes.data, fptr, out.ctypes.data,
        n, h, w, c, _THREADS)
    if rc != 0:
        raise RuntimeError(f"tpugan_batch_gather_u8 failed rc={rc}")
    return out


def normalize_u8_f32(x: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (host-side path; device path preferred)."""
    lib = _load()
    flat = np.ascontiguousarray(x, np.uint8)
    if lib is None:
        return flat.astype(np.float32) / 127.5 - 1.0
    out = np.empty(flat.shape, np.float32)
    rc = lib.tpugan_normalize_u8_f32(flat.ctypes.data, out.ctypes.data,
                                     flat.size, _THREADS)
    if rc != 0:
        raise RuntimeError(f"tpugan_normalize_u8_f32 failed rc={rc}")
    return out
