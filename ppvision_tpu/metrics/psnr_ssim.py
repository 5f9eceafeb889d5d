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

    Rounds to f32 BEFORE normalizing, exactly as the reference's
    ``pytorch_ssim.gaussian`` (f32 tensor, f32 sum/divide) — so the
    values promote bit-identically in the f64 dynamics goldens."""
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2)).astype(np.float32)
    return g / g.sum()


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


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM of two NHWC batches in [0, 1]."""
    win = gaussian_window(window_size, sigma)
    mu1 = _gauss_filter(img1, win)
    mu2 = _gauss_filter(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _gauss_filter(img1 * img1, win) - mu1_sq
    sigma2 = _gauss_filter(img2 * img2, win) - mu2_sq
    sigma12 = _gauss_filter(img1 * img2, win) - mu12
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
