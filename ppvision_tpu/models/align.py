"""Face alignment: FAN landmarks -> similarity transform -> warp.

Port of the reference aligner stack (``Face-DeId/core/wing.py:14-33,
328-467``): sub-pixel landmark extraction from heatmaps
(``get_preds_fromhm``), the eyes/mouth-based similarity estimation
against the CelebA mean landmarks, mirror-padding with blurred
fade-out, and cv2 LANCZOS warping.  The warp/blur stay host-side (cv2)
by design; landmark regression runs on device.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize_bilinear
from .fan import FAN, NUM_LANDMARKS

__all__ = ["heatmap_landmarks", "get_landmarks", "FaceAligner"]


def heatmap_landmarks(hm: jnp.ndarray) -> jnp.ndarray:
    """Sub-pixel landmark coordinates from (B, H, W, C) heatmaps.

    Vectorized port of ``get_preds_fromhm`` (wing.py:14-33): per-channel
    argmax (1-based grid), +/-0.25 shift along the local gradient sign
    when the peak is interior, then the -0.5 offset.  Returns
    (B, C, 2) as (x, y).
    """
    b, h, w, c = hm.shape
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(b, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    px = (idx % w).astype(jnp.int32)  # 0-based
    py = (idx // w).astype(jnp.int32)

    hm_c = jnp.transpose(hm, (0, 3, 1, 2))  # (B, C, H, W)
    bidx = jnp.arange(b)[:, None]
    cidx = jnp.arange(c)[None, :]

    def at(yy, xx):
        return hm_c[bidx, cidx, jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]

    dx = at(py, px + 1) - at(py, px - 1)
    dy = at(py + 1, px) - at(py - 1, px)
    interior = (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
    fx = px + 1 + jnp.where(interior, 0.25 * jnp.sign(dx), 0.0)
    fy = py + 1 + jnp.where(interior, 0.25 * jnp.sign(dy), 0.0)
    return jnp.stack([fx - 0.5, fy - 0.5], axis=-1)


def get_landmarks(fan: FAN, params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 98, 2) landmarks in input pixels (reference get_landmark,
    wing.py:300-310): resize to 256, run FAN, scale heatmap coords x4."""
    xr = resize_bilinear(x, (256, 256))
    out = fan.apply({"params": params}, xr * 0.5 + 0.5).astype(jnp.float32)
    hm = out[..., :NUM_LANDMARKS]
    return heatmap_landmarks(hm) * 4.0


# ---------------------------------------------------------------------------
# Similarity-transform estimation (pure numpy; wing.py:353-425).
# ---------------------------------------------------------------------------

_EYE_L = np.array(list(range(60, 68)) + [96])
_EYE_R = np.array(list(range(68, 76)) + [97])


def _rotate90(v):
    return np.array([v[1], -v[0]])


def _xaxis(lm: np.ndarray) -> np.ndarray:
    eye_l = lm[_EYE_L].mean(axis=0)
    eye_r = lm[_EYE_R].mean(axis=0)
    mouth_l, mouth_r = lm[76], lm[82]
    xp = eye_r - eye_l
    yp = (eye_l + eye_r) / 2 - (mouth_l + mouth_r) / 2
    ax = xp - _rotate90(yp)
    return ax / np.linalg.norm(ax)


def _translation(points: np.ndarray, sign: float) -> np.ndarray:
    t = np.eye(3)
    t[:2, 2] = sign * points.mean(axis=0)
    return t


def _rotation(vec_src: np.ndarray, vec_ref: np.ndarray) -> np.ndarray:
    a = vec_src / np.linalg.norm(vec_src)
    bb = vec_ref / np.linalg.norm(vec_ref)
    c = float(a @ bb)
    cross = a[0] * bb[1] - a[1] * bb[0]  # 2-d cross product (scalar)
    s = np.sqrt(max(0.0, 1 - c * c)) * np.sign(cross)
    return np.array(((c, -s, 0), (s, c, 0), (0, 0, 1)))


def _scale(lm: np.ndarray, ref: np.ndarray) -> np.ndarray:
    xv = lm - lm.mean(axis=0)
    yv = ref - ref.mean(axis=0)
    idx = [96, 97, 76, 82]  # eyes + lip ends
    ratio = (np.linalg.norm(yv, axis=1) / np.linalg.norm(xv, axis=1))[idx].mean()
    s = np.eye(3)
    s[0, 0] = s[1, 1] = ratio
    return s


def _pad_mirror(img: np.ndarray, lm: np.ndarray):
    """Reflect-pad by half the size with a blurred fade to hide seams
    (wing.py:428-443)."""
    import cv2

    h, w, _ = img.shape
    img = np.pad(img, ((h // 2, h // 2), (w // 2, w // 2), (0, 0)), "reflect")
    small = cv2.resize(img, (w, h)).astype(np.float32)
    # sigma = H//100 like the reference (wing.py:437); skimage treats
    # sigma 0 as identity — the 2x down/up resample already softens.
    sigma = h // 100
    blurred = cv2.GaussianBlur(small, (0, 0), sigma) if sigma > 0 else small
    blurred = cv2.resize(blurred, (w * 2, h * 2))

    hh, ww, _ = img.shape
    yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    wy = np.clip(yy / (hh // 4), 0, 1)
    wx = np.clip(xx / (hh // 4), 0, 1)
    wy = np.minimum(wy, np.flip(wy, axis=0))
    wx = np.minimum(wx, np.flip(wx, axis=1))
    weight = np.minimum(wy, wx)[..., None] ** 4
    img = img * weight + blurred * (1 - weight)
    # Landmarks move by the pad offset (h//2, w//2) — the reference
    # expresses this as padded-size//4 (wing.py:444).
    return img, lm + np.array([ww // 4, hh // 4])


class FaceAligner:
    """Align faces to the CelebA mean landmark frame."""

    def __init__(
        self,
        fan: FAN,
        fan_params: Any,
        celeba_mean_landmarks: np.ndarray,  # (98, 2), 256-scale
        output_size: int = 256,
    ):
        self.fan = fan
        self.fan_params = fan_params
        scale = output_size // 256
        self.ref = np.float32(celeba_mean_landmarks) * scale
        self.ref_xaxis = _xaxis(self.ref)
        self.output_size = output_size
        self._landmark_fn = jax.jit(lambda x: get_landmarks(fan, fan_params, x))

    def matrix(self, lm: np.ndarray) -> np.ndarray:
        t0 = _translation(lm, -1.0)
        r = _rotation(_xaxis(lm), self.ref_xaxis)
        s = _scale(lm, self.ref)
        t1 = _translation(self.ref, 1.0)
        return t1 @ s @ r @ t0

    def align(self, imgs: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) images in [-1, 1] -> aligned, same range."""
        import cv2

        cv2.setNumThreads(1)
        lms = np.asarray(self._landmark_fn(jnp.asarray(imgs)))
        out = np.empty_like(imgs)
        size = self.output_size
        for i, (img, lm) in enumerate(zip(imgs, lms)):
            img255 = ((img * 0.5 + 0.5) * 255.0).astype(np.float32)
            padded, lm2 = _pad_mirror(img255, lm.copy())
            mat = self.matrix(lm2)
            rows = max(padded.shape[0], size)
            cols = max(padded.shape[1], size)
            warped = cv2.warpPerspective(
                padded, mat, (cols, rows), flags=cv2.INTER_LANCZOS4
            )
            out[i] = warped[:size, :size] / 255.0 * 2.0 - 1.0
        return out
