"""ctypes bindings for the native data-path kernels (native/gdt_native.c).

Call sites: data/collate.py uses `window_znorm_transpose` (fused pad +
layout transpose per batch item) and `lengths_to_mask_native`; the znorm
variants serve loaders that feed pre-normalized channel-major windows.
Auto-builds the shared library on first use (gcc, ~1s); every entry point
has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgdt_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gdt_window_znorm_transpose.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gdt_batch_znorm_transpose.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gdt_lengths_to_mask.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gdt_preemphasis.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def window_znorm_transpose(
    src: np.ndarray, lo: int, t: int, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """Fused window gather + z-norm + [T,D]->[D,T] transpose."""
    src = np.ascontiguousarray(src, np.float32)
    d = src.shape[1]
    lib = get_lib()
    if lib is None:
        window = src[lo : lo + t]
        out = np.zeros((d, t), np.float32)
        out[:, : window.shape[0]] = (
            (window - mean) / std
        ).T.astype(np.float32)
        return out
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / std, np.float32)
    out = np.empty((d, t), np.float32)
    lib.gdt_window_znorm_transpose(
        _f32p(src), src.shape[0], d, lo, t, _f32p(mean), _f32p(inv_std),
        _f32p(out),
    )
    return out


def batch_znorm_transpose(
    src: np.ndarray, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """[B, T, D] -> z-normalized [B, D, T]."""
    src = np.ascontiguousarray(src, np.float32)
    b, t, d = src.shape
    lib = get_lib()
    if lib is None:
        return ((src - mean) / std).transpose(0, 2, 1).astype(np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / std, np.float32)
    out = np.empty((b, d, t), np.float32)
    lib.gdt_batch_znorm_transpose(
        _f32p(src), b, t, d, _f32p(mean), _f32p(inv_std), _f32p(out)
    )
    return out


def lengths_to_mask_native(lengths: np.ndarray, max_len: int) -> np.ndarray:
    lengths = np.ascontiguousarray(lengths, np.int32)
    lib = get_lib()
    if lib is None:
        return np.arange(max_len)[None, :] < lengths[:, None]
    out = np.empty((len(lengths), max_len), np.uint8)
    lib.gdt_lengths_to_mask(
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(lengths), max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def preemphasis(x: np.ndarray, coef: float = 0.97) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = get_lib()
    if lib is None:
        return np.append(x[0], x[1:] - coef * x[:-1]).astype(np.float32)
    out = np.empty_like(x)
    lib.gdt_preemphasis(_f32p(x), len(x), coef, _f32p(out))
    return out
