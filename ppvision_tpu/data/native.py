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

__all__ = [
    "available",
    "batch_transform",
    "transform_one",
    "has_jpeg",
    "jpeg_dims",
    "decode_jpeg",
    "batch_decode_transform",
]

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
            base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
            try:
                try:
                    # With libjpeg when available (bytes->batch decode
                    # pipeline); plain transform-only build otherwise.
                    subprocess.run(
                        base + ["-DPPV_HAS_JPEG", src, "-ljpeg", "-o", so],
                        check=True, capture_output=True,
                    )
                except (OSError, subprocess.CalledProcessError):
                    subprocess.run(
                        base + [src, "-o", so], check=True, capture_output=True
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
        lib.ppv_has_jpeg.restype = ctypes.c_int
        lib.ppv_jpeg_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ppv_jpeg_dims.restype = ctypes.c_int
        lib.ppv_decode_jpeg.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ppv_decode_jpeg.restype = ctypes.c_int
        lib.ppv_batch_decode_transform.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.ppv_batch_decode_transform.restype = ctypes.c_int
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


def has_jpeg() -> bool:
    """True when the library was built with libjpeg decode support."""
    lib = _load()
    return lib is not None and bool(lib.ppv_has_jpeg())


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(H, W) of a JPEG byte stream from a header-only parse."""
    lib = _load()
    assert lib is not None and lib.ppv_has_jpeg(), "native jpeg unavailable"
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ppv_jpeg_dims(
        buf.ctypes.data, buf.nbytes, ctypes.byref(h), ctypes.byref(w)
    )
    if rc != 0 or h.value <= 0 or w.value <= 0:
        raise ValueError("corrupt JPEG stream")
    return h.value, w.value


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to an (H, W, 3) uint8 RGB array.

    Same decoder (libjpeg) PIL links, so output pixels are identical to
    ``np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))``.
    Raises ValueError on corrupt data.
    """
    lib = _load()
    assert lib is not None and lib.ppv_has_jpeg(), "native jpeg unavailable"
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ppv_jpeg_dims(
        buf.ctypes.data, buf.nbytes, ctypes.byref(h), ctypes.byref(w)
    )
    if rc != 0 or h.value <= 0 or w.value <= 0:
        raise ValueError("corrupt JPEG stream")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ppv_decode_jpeg(
        buf.ctypes.data, buf.nbytes, out.ctypes.data, out.nbytes,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError("corrupt JPEG stream")
    return out


def batch_decode_transform(
    datas: list[bytes],
    crops: np.ndarray,  # (N, 4) int32 (y, x, h, w); y/x -1 = centered
    out_hw: tuple[int, int],
    flips: np.ndarray,  # (N,) bool
    mean: np.ndarray | None = None,
    std: np.ndarray | None = None,
    n_threads: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """JPEG bytes -> transformed float32 batch, fully inside the C++ pool.

    Returns ``(batch, ok)``: corrupt images get a zero slot and
    ``ok[i] == False`` (callers drop or resample them — the reference
    loader's corrupt-image skip).
    """
    lib = _load()
    if lib is None or not lib.ppv_has_jpeg():
        raise RuntimeError("native jpeg unavailable")
    n = len(datas)
    dh, dw = out_hw
    bufs = [np.frombuffer(d, np.uint8) for d in datas]
    ptrs = (ctypes.c_void_p * n)(*[b.ctypes.data for b in bufs])
    lens = (ctypes.c_size_t * n)(*[b.nbytes for b in bufs])
    crops = np.asarray(crops, np.int32)
    cy = (ctypes.c_int * n)(*crops[:, 0].tolist())
    cx = (ctypes.c_int * n)(*crops[:, 1].tolist())
    ch = (ctypes.c_int * n)(*crops[:, 2].tolist())
    cw = (ctypes.c_int * n)(*crops[:, 3].tolist())
    fl = (ctypes.c_int * n)(*[int(f) for f in flips])
    ok = (ctypes.c_int * n)()
    dst = np.empty((n, dh, dw, 3), np.float32)
    m = s = None
    if mean is not None:
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        m, s = mean.ctypes.data, std.ctypes.data
    rc = lib.ppv_batch_decode_transform(
        ptrs, lens, cy, cx, ch, cw, fl,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw, n, m, s,
        ok, n_threads,
    )
    if rc < 0:
        # rc >= 0 is the corrupt-slot count (those slots are zero-filled
        # with ok=False); a no-libjpeg build's stub returns -1 without
        # touching dst — never hand back uninitialized np.empty data.
        raise RuntimeError(f"ppv_batch_decode_transform failed (rc={rc})")
    return dst, np.asarray(ok, np.bool_)


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
    if lib is None:
        raise RuntimeError("native transform unavailable")
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
