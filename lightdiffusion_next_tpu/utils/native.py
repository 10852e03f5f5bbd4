"""ctypes bindings for the native loader kernels (native/ldt_native.cpp).

Compiled on first use with g++ -O3 into ~/.cache/ldt (or LDT_NATIVE_CACHE);
every entry point has a numpy fallback so the framework works without a
toolchain. See native/ldt_native.cpp for what lives in C++ and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "ldt_native.cpp")


def _cache_dir() -> str:
    return os.environ.get(
        "LDT_NATIVE_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "ldt")
    )


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _source_path()
        if not os.path.exists(src):
            return None
        os.makedirs(_cache_dir(), exist_ok=True)
        so = os.path.join(_cache_dir(), "ldt_native.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            # inside the try: a stale cached .so missing a newer symbol
            # must fall back to numpy, not raise AttributeError
            c_i64 = ctypes.c_int64
            lib.ldt_bf16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, c_i64]
            lib.ldt_f16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, c_i64]
            lib.ldt_dequant_q8_0.argtypes = [ctypes.c_void_p, ctypes.c_void_p, c_i64]
            lib.ldt_split_q8_0.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, c_i64,
            ]
            lib.ldt_box_blur_2d.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                c_i64, c_i64, c_i64,
            ]
            lib.ldt_transpose_2d.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, c_i64, c_i64, c_i64, c_i64,
            ]
        except Exception:
            return None
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    raw_u16 = np.ascontiguousarray(raw_u16.view(np.uint16))
    lib = load_library()
    if lib is None:
        return (raw_u16.astype(np.uint32) << 16).view(np.float32)
    out = np.empty(raw_u16.shape, dtype=np.float32)
    lib.ldt_bf16_to_f32(_ptr(raw_u16), _ptr(out), raw_u16.size)
    return out


def f16_to_f32(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw)
    lib = load_library()
    if lib is None:
        return raw.view(np.float16).astype(np.float32)
    out = np.empty(raw.shape, dtype=np.float32)
    lib.ldt_f16_to_f32(_ptr(raw.view(np.uint16)), _ptr(out), raw.size)
    return out


def split_q8_0(blocks_u8: np.ndarray):
    """(n_blocks, 34) uint8 -> (q int8 (n,32), scales f32 (n,))."""
    blocks_u8 = np.ascontiguousarray(blocks_u8)
    n = blocks_u8.shape[0]
    lib = load_library()
    if lib is None:
        scales = blocks_u8[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = blocks_u8[:, 2:].copy().view(np.int8)
        return q, scales
    q = np.empty((n, 32), dtype=np.int8)
    scales = np.empty((n,), dtype=np.float32)
    lib.ldt_split_q8_0(_ptr(blocks_u8), _ptr(q), _ptr(scales), n)
    return q, scales


def dequant_q8_0(blocks_u8: np.ndarray) -> np.ndarray:
    blocks_u8 = np.ascontiguousarray(blocks_u8)
    n = blocks_u8.shape[0]
    lib = load_library()
    if lib is None:
        q, scales = split_q8_0(blocks_u8)
        return (q.astype(np.float32) * scales[:, None]).reshape(-1)
    out = np.empty((n * 32,), dtype=np.float32)
    lib.ldt_dequant_q8_0(_ptr(blocks_u8), _ptr(out), n)
    return out


def transpose2d(a: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Contiguous transposed copy of a 2-D array (blocked + threaded in
    C++; numpy fallback). The loader's GGUF->fused-layout path transposes
    ~12 GB of int8 codes per Flux checkpoint — numpy's strided `.T` copy
    does that single-threaded at byte granularity."""
    assert a.ndim == 2
    lib = load_library()
    if lib is None or a.dtype.itemsize not in (1, 2, 4, 8):
        return np.ascontiguousarray(a.T)
    a = np.ascontiguousarray(a)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    out = np.empty((a.shape[1], a.shape[0]), dtype=a.dtype)
    lib.ldt_transpose_2d(
        _ptr(a), _ptr(out), a.shape[0], a.shape[1], a.dtype.itemsize, n_threads
    )
    return out


def box_blur_2d(mask: np.ndarray, radius: int) -> np.ndarray:
    mask = np.ascontiguousarray(mask, dtype=np.float32)
    lib = load_library()
    if lib is None or radius <= 0:
        return mask
    h, w = mask.shape
    out = np.empty_like(mask)
    tmp = np.empty_like(mask)
    lib.ldt_box_blur_2d(_ptr(mask), _ptr(out), _ptr(tmp), h, w, radius)
    return out
