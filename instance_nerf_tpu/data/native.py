"""ctypes binding for the native host preprocessing library.

Builds ``native/voxel_ops.cpp`` with g++ on first use (cached in
``native/``); every entry point has a numpy fallback so the package works
without a toolchain. See native/voxel_ops.cpp for rationale.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "voxel_ops.cpp")
_SO = os.path.join(_NATIVE_DIR, "libvoxel_ops.so")
_STAMP = _SO + ".srchash"


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            # rebuild whenever the source hash differs from the stamp —
            # mtimes are unreliable after a fresh checkout, and the .so is
            # never committed (built artifacts are .gitignored)
            h = _src_hash()
            stamped = None
            if os.path.isfile(_STAMP):
                with open(_STAMP) as f:
                    stamped = f.read().strip()
            if (not os.path.isfile(_SO)) or stamped != h:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffast-math",
                     "-funroll-loops", "-shared", "-fPIC",
                     "-o", _SO, _SRC, "-lpthread", "-lm"],
                    check=True, capture_output=True,
                )
                with open(_STAMP, "w") as f:
                    f.write(h)
            lib = ctypes.CDLL(_SO)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.density_to_alpha_ngp.argtypes = [f32p, f32p, ctypes.c_size_t]
            lib.density_to_alpha_ddp.argtypes = [f32p, f32p, ctypes.c_size_t]
            lib.u8_to_f32.argtypes = [u8p, f32p, ctypes.c_size_t]
            lib.pad_copy_4d.argtypes = [f32p, f32p] + [ctypes.c_int64] * 7
            lib.instance_masks.argtypes = [i64p, i64p, u8p,
                                           ctypes.c_size_t, ctypes.c_size_t]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def density_to_alpha(sigma: np.ndarray, kind: str = "ngp") -> np.ndarray:
    lib = _load()
    sigma = np.ascontiguousarray(sigma, np.float32)
    if lib is None:
        if kind == "ngp":
            return np.clip(1.0 - np.exp(-np.exp(sigma) / 100.0), 0.0, 1.0)
        return np.clip(1.0 - np.exp(-np.clip(sigma, 0, None) / 100.0), 0.0, 1.0)
    out = np.empty_like(sigma)
    fn = lib.density_to_alpha_ngp if kind == "ngp" else lib.density_to_alpha_ddp
    fn(_fp(sigma), _fp(out), sigma.size)
    return out


def pad_copy(src: np.ndarray, pad_shape) -> np.ndarray:
    """(w, l, h, c) f32 -> zero-padded (pw, pl, ph, c)."""
    lib = _load()
    w, l, h, c = src.shape
    pw, pl, ph = pad_shape
    if lib is None:
        out = np.zeros((pw, pl, ph, c), np.float32)
        out[:w, :l, :h] = src
        return out
    src = np.ascontiguousarray(src, np.float32)
    out = np.zeros((pw, pl, ph, c), np.float32)
    lib.pad_copy_4d(_fp(src), _fp(out), w, l, h, c, pw, pl, ph)
    return out


def instance_masks(grid: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """(W, L, H) int64 id grid + (K,) ids -> (K, W, L, H) uint8 masks."""
    lib = _load()
    grid = np.ascontiguousarray(grid, np.int64)
    ids = np.ascontiguousarray(ids, np.int64)
    if lib is None:
        return (grid[None] == ids[:, None, None, None]).astype(np.uint8)
    out = np.empty((ids.size, grid.size), np.uint8)
    lib.instance_masks(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        grid.size, ids.size,
    )
    return out.reshape(ids.size, *grid.shape)
