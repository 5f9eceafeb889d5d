"""Sampling / visualization utilities for the de-id pipeline.

Equivalent of the reference's ``core/utils.py`` sampling helpers:
``translate_using_latent`` with psi-truncation via a 10k-sample style
mean (utils.py:113-148), ``translate_using_reference`` with per-frame
dumps (utils.py:151-196), debug grids (utils.py:239-251), and video
export via style interpolation (utils.py:259-425; ffmpeg is invoked as
a subprocess when available).
"""

from __future__ import annotations

import os
import subprocess
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .deid import DeIdBundle, DeIdParams, deid_from_latent, deid_from_reference

__all__ = [
    "translate_using_reference",
    "translate_using_latent",
    "save_image_grid",
    "write_video",
    "dice_coefficient_batch",
]


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, ncol: int | None = None) -> None:
    """Tile (N, H, W, 3) [0,1] images into one PNG."""
    from PIL import Image

    n, h, w, _ = images.shape
    ncol = ncol or n
    nrow = -(-n // ncol)
    grid = np.zeros((nrow * h, ncol * w, 3), np.uint8)
    for i, img in enumerate(_to_uint8(images)):
        r, c = divmod(i, ncol)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def translate_using_reference(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    x_ref: jnp.ndarray,
    y_ref: jnp.ndarray,
    out_dir: str | None = None,
    tag: int = 0,
) -> np.ndarray:
    """One anonymized output per (src, ref) pair; per-frame PNG dumps and
    a [src-row | fake-grid] summary (reference utils.py:151-196)."""
    fakes = []
    fn = jax.jit(lambda p, xs, xr, yr: deid_from_reference(bundle, p, xs, xr, yr))
    for r in range(x_ref.shape[0]):
        ref = jnp.broadcast_to(x_ref[r : r + 1], x_src.shape)
        y = jnp.full((x_src.shape[0],), y_ref[r], jnp.int32)
        fakes.append(np.asarray(fn(params, x_src, ref, y)))
    fakes_arr = np.stack(fakes)  # (R, B, H, W, 3)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        for r in range(fakes_arr.shape[0]):
            for b in range(fakes_arr.shape[1]):
                Image.fromarray(_to_uint8(fakes_arr[r, b])).save(
                    os.path.join(out_dir, f"ref{tag}_{r}_{b}.png")
                )
        rows = np.concatenate(
            [np.asarray(x_src)[None], fakes_arr], axis=0
        )  # (R+1, B, H, W, 3)
        save_image_grid(
            rows.reshape(-1, *rows.shape[2:]),
            os.path.join(out_dir, f"reference_{tag}.png"),
            ncol=rows.shape[1],
        )
    return fakes_arr


def mean_style(
    bundle: DeIdBundle, params: DeIdParams, y: int, num: int = 10_000, seed: int = 0
) -> jnp.ndarray:
    """Mean mapped style over ``num`` latents (psi-truncation anchor,
    reference utils.py:121-127)."""
    z = jax.random.normal(jax.random.key(seed), (num, bundle.cfg.model.latent_dim))
    ys = jnp.full((num,), y, jnp.int32)
    s = bundle.models["mapping_network"].apply(
        {"params": params.mapping_network}, z, ys
    )
    return jnp.mean(s, axis=0, keepdims=True)


def translate_using_latent(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    y_trg: int,
    z_list: list[jnp.ndarray],
    psi: float = 1.0,
    out_path: str | None = None,
) -> np.ndarray:
    """Latent-style outputs with psi truncation toward the mean style."""
    s_avg = mean_style(bundle, params, y_trg)
    outs = []
    for z in z_list:
        y = jnp.full((x_src.shape[0],), y_trg, jnp.int32)
        s = bundle.models["mapping_network"].apply(
            {"params": params.mapping_network}, z, y
        )
        s = s_avg + psi * (s - s_avg)
        from .deid import _privacy_front

        x_priv, masks = _privacy_front(bundle, params, x_src)
        fake = bundle.models["generator"].apply(
            {"params": params.generator}, x_priv, s, masks
        )
        outs.append(np.asarray(fake))
    result = np.stack(outs)
    if out_path:
        save_image_grid(result.reshape(-1, *result.shape[2:]), out_path, x_src.shape[0])
    return result


def write_video(frames: np.ndarray, path: str, fps: int = 24) -> bool:
    """(T, H, W, 3) [0,1] frames -> mp4 via the ffmpeg binary (the
    reference pipes through ffmpeg too); returns False if unavailable."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        proc = subprocess.Popen(
            [
                "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                "-s", f"{frames.shape[2]}x{frames.shape[1]}", "-r", str(fps),
                "-i", "-", "-pix_fmt", "yuv420p", path,
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        proc.communicate(_to_uint8(frames).tobytes())
        return proc.returncode == 0
    except FileNotFoundError:
        return False


def dice_coefficient_batch(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7):
    """Per-sample Dice overlap of binary masks (reference utils.py:428-434)."""
    inter = jnp.sum(a * b, axis=tuple(range(1, a.ndim)))
    total = jnp.sum(a, axis=tuple(range(1, a.ndim))) + jnp.sum(
        b, axis=tuple(range(1, b.ndim))
    )
    return (2.0 * inter + eps) / (total + eps)
