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
    "get_alphas",
    "video_ref",
    "video_latent",
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


def get_alphas(start=-5.0, end=5.0, step=0.5, len_tail=10) -> np.ndarray:
    """Sigmoid-eased interpolation schedule (reference utils.py:263-264)."""
    mid = 1.0 / (1.0 + np.exp(-np.arange(start, end, step)))
    return np.concatenate([[0.0], mid, np.ones(len_tail)]).astype(np.float32)


def _interpolate_frames(bundle, params, x_priv, masks, s_prev, s_next, alphas):
    """All interpolation frames in ONE generator call: styles for every
    alpha ride the batch axis ((T*B) batch), instead of the reference's
    per-alpha python loop (utils.py:267-283) — T=31 frames per segment
    become a single MXU-saturating jitted call."""
    b = x_priv.shape[0]
    t = alphas.shape[0]
    d = s_prev.shape[-1]
    a = jnp.asarray(alphas)[:, None, None]  # (T,1,1)
    styles = s_prev[None] + a * (s_next[None] - s_prev[None])  # (T,?,D)
    styles = jnp.broadcast_to(styles, (t, b, d)).reshape(t * b, d)
    # Generator multi-style path: encode once, decode all T styles.
    fakes = bundle.models["generator"].apply(
        {"params": params.generator}, x_priv, styles, masks
    )
    fakes = fakes.reshape(t, b, *fakes.shape[1:])
    # Per-frame min-max normalize (utils.py:278).
    lo = jnp.min(fakes, axis=(1, 2, 3, 4), keepdims=True)
    hi = jnp.max(fakes, axis=(1, 2, 3, 4), keepdims=True)
    return (fakes - lo) / (hi - lo + 1e-8)


def _slide_canvas(x_prev: np.ndarray, x_next: np.ndarray, alphas, margin=32):
    """Sliding reference window (reference utils.py:287-308): the next
    ref slides up over the previous one; (T, 2H, W+margin, 3)."""
    h, w, _ = x_prev.shape[1:]
    merged = np.concatenate([np.asarray(x_prev[0]), np.asarray(x_next[0])], axis=0)
    t = len(alphas)
    canvas = np.zeros((t, 2 * h, w + margin, 3), np.float32)
    for ti, alpha in enumerate(alphas):
        top = int(h * (1.0 - alpha))
        canvas[ti, top : 2 * h, :w] = merged[: 2 * h - top]
    return canvas


def _grid_rows(x_src: np.ndarray, fakes: np.ndarray) -> np.ndarray:
    """(T,B,H,W,3) fakes + (B,H,W,3) src -> (T, 2H, B*W, 3): source row
    above fake row (reference's make_grid of cat([src, fake], dim=2))."""
    t, b, h, w, c = fakes.shape
    src_row = np.concatenate(list(np.asarray(x_src)), axis=1)  # (H, B*W, 3)
    out = np.empty((t, 2 * h, b * w, c), np.float32)
    out[:, :h] = src_row[None]
    out[:, h:] = fakes.transpose(0, 2, 1, 3, 4).reshape(t, h, b * w, c)
    return out


def video_ref(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    x_ref: jnp.ndarray,
    y_ref: jnp.ndarray,
    fname: str,
    fps: int = 15,
) -> np.ndarray:
    """Reference-interpolation de-id video (reference utils.py:310-341):
    the camera privatizes ``x_src`` once; for every consecutive
    same-domain pair of reference faces, styles are sigmoid-interpolated
    and anonymized frames rendered with a slide panel of the two refs.

    Returns the (T, H, W, 3) frame array; also writes ``fname`` when
    ffmpeg exists.
    """
    from .deid import _privacy_front

    x_priv, masks = jax.jit(lambda p, x: _privacy_front(bundle, p, x))(params, x_src)
    s_ref = bundle.models["style_encoder"].apply(
        {"params": params.style_encoder}, x_ref, y_ref
    )
    alphas = get_alphas()
    interp = jax.jit(
        lambda p, sp, sn: _interpolate_frames(
            bundle, p, x_priv, masks, sp, sn, alphas
        )
    )
    segments = []
    prev = None
    for r in range(x_ref.shape[0]):
        cur = (x_ref[r : r + 1], int(y_ref[r]), s_ref[r : r + 1])
        if prev is None or prev[1] != cur[1]:
            prev = cur
            continue
        fakes = np.asarray(interp(params, prev[2], cur[2]))
        rows = _grid_rows(np.asarray(x_src), fakes)
        slided = _slide_canvas(np.asarray(prev[0]), np.asarray(cur[0]), alphas)
        segments.append(np.concatenate([slided, rows], axis=2))
        prev = cur
    if not segments:
        raise ValueError("need >= 2 reference images of the same domain")
    segments.append(np.repeat(segments[-1][-1:], 10, axis=0))
    video = np.concatenate(segments)
    write_video(video, fname, fps=fps)
    return video


def video_latent(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    y_list: list[int],
    z_list: list[jnp.ndarray],
    psi: float,
    fname: str,
    fps: int = 15,
) -> np.ndarray:
    """Latent-interpolation video with psi truncation (utils.py:344-374)."""
    s_list = []
    for y in y_list:
        s_avg = mean_style(bundle, params, y)
        for z in z_list:
            ys = jnp.full((z.shape[0],), y, jnp.int32)
            s = bundle.models["mapping_network"].apply(
                {"params": params.mapping_network}, z, ys
            )
            s_list.append(s_avg + psi * (s - s_avg))
    from .deid import _privacy_front

    x_priv, masks = jax.jit(lambda p, x: _privacy_front(bundle, p, x))(params, x_src)
    alphas = get_alphas()
    interp = jax.jit(
        lambda p, sp, sn: _interpolate_frames(
            bundle, p, x_priv, masks, sp, sn, alphas
        )
    )
    segments = []
    s_prev = None
    for idx, s_next in enumerate(s_list):
        if s_prev is None or idx % len(z_list) == 0:
            s_prev = s_next
            continue
        fakes = np.asarray(interp(params, s_prev, s_next))
        segments.append(_grid_rows(np.asarray(x_src), fakes))
        s_prev = s_next
    if not segments:
        raise ValueError("need >= 2 latent codes per domain")
    segments.append(np.repeat(segments[-1][-1:], 10, axis=0))
    video = np.concatenate(segments)
    write_video(video, fname, fps=fps)
    return video


def dice_coefficient_batch(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7):
    """Per-sample Dice overlap of binary masks (reference utils.py:428-434)."""
    inter = jnp.sum(a * b, axis=tuple(range(1, a.ndim)))
    total = jnp.sum(a, axis=tuple(range(1, a.ndim))) + jnp.sum(
        b, axis=tuple(range(1, b.ndim))
    )
    return (2.0 * inter + eps) / (total + eps)
