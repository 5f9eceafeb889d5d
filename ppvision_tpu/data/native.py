"""ctypes bridge to the native C++ batch-transform library.

Builds ``native/transform.cpp`` on first use (g++, cached next to the
source) and exposes PIL-exact crop/resize/flip/normalize batch assembly
with a C++ thread pool.  Falls back gracefully when no compiler is
available — callers check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "batch_transform", "transform_one"]

_lock = threading.Lock()
_lib = None
_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _warn_fallback(reason: str) -> None:
    """One-time notice: the python/PIL transform path is ~7x slower on
    multi-core hosts (PERF.md), so a silent fallback would look like a
    data-pipeline regression."""
    import sys

    print(
        f"ppvision_tpu: native transform library unavailable ({reason}); "
        "falling back to the python/PIL path (correct, slower)",
        file=sys.stderr,
    )


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.abspath(os.path.join(_native_dir(), "transform.cpp"))
        so = os.path.join(
            os.environ.get("PPVISION_CACHE", os.path.expanduser("~/.cache/ppvision_tpu")),
            "libppv_transform.so",
        )
        os.makedirs(os.path.dirname(so), exist_ok=True)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     src, "-o", so],
                    check=True, capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError) as e:
                _warn_fallback(f"g++ build failed: {e}")
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            _warn_fallback(f"dlopen failed: {e}")
            return None
        lib.ppv_batch_transform.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ppv_transform_one.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def transform_one(
    img: np.ndarray, crop: tuple[int, int, int, int], out_hw: tuple[int, int],
    flip: bool = False,
) -> np.ndarray:
    """Crop (y, x, h, w) + PIL-bilinear resize + optional hflip -> f32 [0,1]."""
    lib = _load()
    assert lib is not None, "native transform unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    dh, dw = out_hw
    dst = np.empty((dh, dw, 3), np.float32)
    cy, cx, ch, cw = crop
    lib.ppv_transform_one(
        img.ctypes.data, img.shape[0], img.shape[1], cy, cx, ch, cw,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw, int(flip),
    )
    return dst


def batch_transform(
    imgs: list[np.ndarray],
    crops: np.ndarray,  # (N, 4) int32 (y, x, h, w)
    out_hw: tuple[int, int],
    flips: np.ndarray,  # (N,) bool
    mean: np.ndarray | None = None,
    std: np.ndarray | None = None,
    n_threads: int = 8,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native transform unavailable"
    n = len(imgs)
    dh, dw = out_hw
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in imgs])
    sh = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    sw = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    crops = np.asarray(crops, np.int32)
    cy = (ctypes.c_int * n)(*crops[:, 0].tolist())
    cx = (ctypes.c_int * n)(*crops[:, 1].tolist())
    ch = (ctypes.c_int * n)(*crops[:, 2].tolist())
    cw = (ctypes.c_int * n)(*crops[:, 3].tolist())
    fl = (ctypes.c_int * n)(*[int(f) for f in flips])
    dst = np.empty((n, dh, dw, 3), np.float32)
    m = s = None
    if mean is not None:
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        m, s = mean.ctypes.data, std.ctypes.data
    lib.ppv_batch_transform(
        ptrs, sh, sw, cy, cx, ch, cw, fl,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw, n, m, s,
        n_threads,
    )
    return dst
