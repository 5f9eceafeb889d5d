"""Differentiable SSIM + PSNR (pure JAX, NHWC).

Same formulation as the reference's ``pytorch_ssim``
(``Image_Caption/pytorch_ssim/__init__.py:8-79``): per-channel 11x11
Gaussian window (sigma 1.5), SAME padding, C1=0.01^2, C2=0.03^2, mean
over everything.  Used both as the privacy objective (train.py:280-286,
weight 6 on ``1 - SSIM``) and as an eval metric with PSNR
(eval_total.py:78-85).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim", "psnr", "gaussian_window"]


def gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D Gaussian window, normalized to sum 1 (float32).

    Bit-follows the reference's ``pytorch_ssim.gaussian``: scalar
    ``math.exp`` (libm — ``np.exp``'s SIMD path differs by ~1 ulp,
    which SSIM's variance cancellation amplifies to ~3e-6), rounded to
    f32 BEFORE the f32 sum/divide — so the values promote
    bit-identically in the f64 dynamics goldens."""
    import math

    g = np.array(
        [math.exp(-((i - size // 2) ** 2) / float(2 * sigma**2)) for i in range(size)],
        dtype=np.float32,
    )
    # torch's f32 .sum() accumulates at higher precision (measured: it
    # equals the f64 sum rounded to f32; np.sum's f32 pairwise sum is
    # 1 ulp off, which the normalize then bakes into every tap).
    return g / np.float32(g.astype(np.float64).sum())


def _gauss_filter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur with SAME zero padding (torch
    conv2d padding=window//2 semantics)."""
    from ..ops.cpuconv import conv2d

    c = x.shape[-1]
    kh = jnp.asarray(win, dtype=x.dtype)[:, None, None, None]
    kw = jnp.asarray(win, dtype=x.dtype)[None, :, None, None]
    pad = len(win) // 2
    x = conv2d(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), [(pad, pad), (0, 0)],
        feature_group_count=c,
    )
    return conv2d(
        x, jnp.tile(kw, (1, 1, 1, c)), (1, 1), [(0, 0), (pad, pad)],
        feature_group_count=c,
    )


def _gauss_filter_2d(x: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Depthwise conv with the f32-rounded 2-D OUTER-PRODUCT window —
    pytorch_ssim's exact formulation (``create_window``: the 1-D f32
    window ``mm`` its transpose, rounding each product to f32, then
    ``type_as(img)``).  The separable form multiplies the two 1-D taps
    in the compute dtype instead, which differs at the f32 rounding
    level (~5e-6 on SSIM) — visible in the f64 dynamics goldens."""
    from ..ops.cpuconv import conv2d

    c = x.shape[-1]
    w2 = np.outer(win.astype(np.float32), win.astype(np.float32))
    k = jnp.asarray(w2.astype(np.float32), dtype=x.dtype)[:, :, None, None]
    pad = len(win) // 2
    return conv2d(
        x, jnp.tile(k, (1, 1, 1, c)), (1, 1), [(pad, pad), (pad, pad)],
        feature_group_count=c,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM of two NHWC batches in [0, 1]."""
    win = gaussian_window(window_size, sigma)
    if img1.dtype == jnp.float64:
        # f64 golden path: bit-follow pytorch_ssim's 2-D f32 window.
        _gf = lambda x, w: _gauss_filter_2d(x, w)  # noqa: E731
    else:
        _gf = _gauss_filter
    mu1 = _gf(img1, win)
    mu2 = _gf(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _gf(img1 * img1, win) - mu1_sq
    sigma2 = _gf(img2 * img2, win) - mu2_sq
    sigma12 = _gf(img1 * img2, win) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))
