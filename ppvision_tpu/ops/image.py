"""Image resampling ops with exact torch ``F.interpolate`` semantics.

The reference resizes heatmaps/masks with ``F.interpolate`` in three
flavors (bilinear align_corners True and False, nearest); parity
requires replicating them exactly — ``jax.image.resize`` antialiases on
downsampling and has no align_corners mode, so these are implemented as
static gather+lerp over precomputed indices (XLA fuses them).

Layout: NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "avg_pool_2x",
    "upsample_nearest_2x",
]


def _bilinear_weights_np(in_size: int, out_size: int, align_corners: bool):
    """Static (lo, hi, w_hi) gather indices/weights for one axis (numpy)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = i * scale
    else:
        scale = in_size / out_size
        src = np.clip((i + 0.5) * scale - 0.5, 0.0, None)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = src - lo  # float64; callers cast to their working precision
    return lo, hi, w


def _bilinear_weights(in_size: int, out_size: int, align_corners: bool):
    lo, hi, w = _bilinear_weights_np(in_size, out_size, align_corners)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w.astype(np.float32))


import functools
import os


@functools.lru_cache(maxsize=64)
def _resize_matrix_np(
    in_size: int, out_size: int, align_corners: bool, f64: bool = False
) -> np.ndarray:
    """Dense (out, in) bilinear interpolation matrix (2 nonzeros/row).

    Cached as NUMPY: a jnp constant created inside a jit trace is a
    tracer, and caching one leaks it across traces.  ``f64`` keeps the
    weights at full double precision (torch computes them in double too
    — needed by the f64 dynamics goldens); the default f32 weights are
    bit-identical to the previous behavior.
    """
    lo, hi, w = _bilinear_weights_np(in_size, out_size, align_corners)
    if not f64:
        w = w.astype(np.float32)
    m = np.zeros((out_size, in_size), np.float64 if f64 else np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def _resize_matrix(
    in_size: int, out_size: int, align_corners: bool, dtype=None
) -> jnp.ndarray:
    f64 = dtype is not None and jnp.dtype(dtype) == jnp.dtype(np.float64)
    return jnp.asarray(_resize_matrix_np(in_size, out_size, align_corners, f64))


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor, matching torch F.interpolate.

    Implemented as two separable matmuls with static interpolation
    matrices: on TPU a dense (out, in) x (in, ...) contraction rides the
    MXU and beats the gather+lerp formulation (HBM gather-bound) by a
    wide margin.  HIGHEST precision keeps f32-exact interpolation (each
    row has only two nonzeros, so the contraction is numerically the
    same lerp).  Set PPVISION_RESIZE=gather to force the old path.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if os.environ.get("PPVISION_RESIZE") == "gather":
        # Interpolation weights in the INPUT dtype: f64 inputs get the
        # full-double weights (same source as the f64 matrix path the
        # free-running f64 goldens use); everything else keeps f32.
        wdt = jnp.float64 if x.dtype == jnp.float64 else jnp.float32

        def _wts(in_size, out_size):
            lo, hi, w = _bilinear_weights_np(in_size, out_size, align_corners)
            return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w.astype(wdt))

        lo, hi, wt = _wts(h, oh)
        wt = wt[:, None, None]
        x = x.take(lo, axis=-3) * (1 - wt) + x.take(hi, axis=-3) * wt
        lo, hi, wt = _wts(w, ow)
        wt = wt[:, None]
        x = x.take(lo, axis=-2) * (1 - wt) + x.take(hi, axis=-2) * wt
        return x
    dtype = x.dtype
    mh = _resize_matrix(h, oh, align_corners, dtype)
    mw = _resize_matrix(w, ow, align_corners, dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x, precision="highest")
    y = jnp.einsum("pw,...owc->...opc", mw, y, precision="highest")
    return y.astype(dtype)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch semantics: src = floor(i * in / out))."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    ridx = jnp.asarray((np.arange(oh) * h) // oh)
    cidx = jnp.asarray((np.arange(ow) * w) // ow)
    return x.take(ridx, axis=-3).take(cidx, axis=-2)


@functools.lru_cache(maxsize=16)
def _diag_pool_kernel_np(c: int) -> np.ndarray:
    """(2, 2, c, c) kernel with 0.25 on the channel diagonal (numpy)."""
    k = np.zeros((2, 2, c, c), np.float32)
    k[:, :, np.arange(c), np.arange(c)] = 0.25
    return k


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 mean pool of an NHWC tensor.

    For real channel counts this is a stride-2 conv with a channel-
    diagonal 0.25 kernel: it rides the MXU with f32 accumulation and —
    unlike the 6D-view slice form — never forces a layout copy of the
    pre-pool tensor (the slice form cost ~5 ms/step of pure copies at
    bench shapes; the conv form micro-benches 10% faster AND fuses into
    the conv stream).  Bit-exact vs the slice form for bf16 inputs:
    x*0.25 is an exponent shift, the bf16xbf16 MXU product is exact, and
    the conv accumulates in f32.  f32 inputs keep the slice form (a
    default-precision f32 conv decomposes into bf16 passes and would NOT
    be exact), as do tiny-C inputs (RAFT's 1-channel corr pyramid) where
    a C x C conv is pure overhead.
    """
    b, h, w, c = x.shape
    if c >= 8 and x.dtype == jnp.bfloat16:
        from jax import lax

        # No preferred_element_type: the MXU accumulates bf16 convs in
        # f32 regardless and rounds ONCE to the bf16 output — the same
        # value as an f32 output + cast.  Requesting an f32 output also
        # breaks reverse-mode: the conv transpose rule feeds the f32
        # cotangent back against the bf16 kernel, and lax.conv rejects
        # mixed dtypes (seen under the R1 grad-of-grad in train/gan.py).
        k = jnp.asarray(_diag_pool_kernel_np(c)).astype(x.dtype)
        return lax.conv_general_dilated(
            x,
            k,
            (2, 2),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # Fixed-index slices (not ::2 strided indexing, which lowers to
    # gather) keep this a pure slice+add fusion.
    s = (
        xr[:, :, 0, :, 0].astype(jnp.promote_types(x.dtype, jnp.float32))
        + xr[:, :, 1, :, 0]
        + xr[:, :, 0, :, 1]
        + xr[:, :, 1, :, 1]
    )
    return (s * 0.25).astype(x.dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (exact duplication).

    Broadcast+reshape instead of two ``jnp.repeat``s: one fused
    relayout, no gather lowering.
    """
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)
