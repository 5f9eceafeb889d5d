"""Frechet Inception Distance (InceptionV3 pool3 features, NHWC Flax).

Same pipeline as the reference (``Face-DeId/metrics/fid.py``):
torchvision-architecture InceptionV3 up to the final average pool
(2048-d), activations accumulated over 299^2 ImageNet-normalized
images, Frechet distance via scipy ``sqrtm`` on the host
(fid.py:46-69).  Pretrained weights convert from a torchvision
state_dict through ``utils.torch_import``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["InceptionV3", "frechet_distance", "fid_from_activations", "compute_statistics"]


class BasicConv(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype
        )(x)
        return nn.relu(x)


def _pad(k):
    return ((k, k), (k, k))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        b1 = c(64, (1, 1))(x)
        b5 = c(48, (1, 1))(x)
        b5 = c(64, (5, 5), padding=_pad(2))(b5)
        b3 = c(64, (1, 1))(x)
        b3 = c(96, (3, 3), padding=_pad(1))(b3)
        b3 = c(96, (3, 3), padding=_pad(1))(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = c(self.pool_features, (1, 1))(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        b3 = c(384, (3, 3), strides=(2, 2))(x)
        bd = c(64, (1, 1))(x)
        bd = c(96, (3, 3), padding=_pad(1))(bd)
        bd = c(96, (3, 3), strides=(2, 2))(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels7: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        c7 = self.channels7
        b1 = c(192, (1, 1))(x)
        b7 = c(c7, (1, 1))(x)
        b7 = c(c7, (1, 7), padding=((0, 0), (3, 3)))(b7)
        b7 = c(192, (7, 1), padding=((3, 3), (0, 0)))(b7)
        bd = c(c7, (1, 1))(x)
        bd = c(c7, (7, 1), padding=((3, 3), (0, 0)))(bd)
        bd = c(c7, (1, 7), padding=((0, 0), (3, 3)))(bd)
        bd = c(c7, (7, 1), padding=((3, 3), (0, 0)))(bd)
        bd = c(192, (1, 7), padding=((0, 0), (3, 3)))(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = c(192, (1, 1))(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        b3 = c(192, (1, 1))(x)
        b3 = c(320, (3, 3), strides=(2, 2))(b3)
        b7 = c(192, (1, 1))(x)
        b7 = c(192, (1, 7), padding=((0, 0), (3, 3)))(b7)
        b7 = c(192, (7, 1), padding=((3, 3), (0, 0)))(b7)
        b7 = c(192, (3, 3), strides=(2, 2))(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        b1 = c(320, (1, 1))(x)
        b3 = c(384, (1, 1))(x)
        b3 = jnp.concatenate(
            [
                c(384, (1, 3), padding=((0, 0), (1, 1)))(b3),
                c(384, (3, 1), padding=((1, 1), (0, 0)))(b3),
            ],
            axis=-1,
        )
        bd = c(448, (1, 1))(x)
        bd = c(384, (3, 3), padding=_pad(1))(bd)
        bd = jnp.concatenate(
            [
                c(384, (1, 3), padding=((0, 0), (1, 1)))(bd),
                c(384, (3, 1), padding=((1, 1), (0, 0)))(bd),
            ],
            axis=-1,
        )
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = c(192, (1, 1))(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature extractor: 299^2 normalized NHWC -> (B, 2048) pool3."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = partial(BasicConv, dtype=self.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = c(32, (3, 3), strides=(2, 2))(x)
        x = c(32, (3, 3))(x)
        x = c(64, (3, 3), padding=_pad(1))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1))(x)
        x = c(192, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=self.dtype)(x)
        x = InceptionA(64, dtype=self.dtype)(x)
        x = InceptionA(64, dtype=self.dtype)(x)
        x = InceptionB(dtype=self.dtype)(x)
        for ch in (128, 160, 160, 192):
            x = InceptionC(ch, dtype=self.dtype)(x)
        x = InceptionD(dtype=self.dtype)(x)
        x = InceptionE(dtype=self.dtype)(x)
        x = InceptionE(dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        return x.astype(jnp.float32)


def compute_statistics(acts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    cov = np.cov(acts, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """Host-side Frechet distance (scipy sqrtm, reference fid.py:46-69)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def fid_from_activations(real: np.ndarray, fake: np.ndarray) -> float:
    return frechet_distance(*compute_statistics(real), *compute_statistics(fake))


def collect_activations(
    model: InceptionV3, params: Any, batches: Iterable[np.ndarray]
) -> np.ndarray:
    """Inception activations over batches, ONE compiled program: the
    ragged last batch is padded (replicating its final row) up to the
    first batch's size and the pad activations dropped — a second
    shape would trigger a full Inception re-jit for one batch."""
    fn = jax.jit(lambda x: model.apply(params, x))
    outs = []
    full = None
    for b in batches:
        b = np.asarray(b)
        if b.shape[0] == 0:
            continue
        if full is None:
            full = b.shape[0]
        # Every program runs at the first batch's size: short chunks pad
        # up (replicating the final row, pad activations dropped) and
        # batches LARGER than the first split into first-batch-sized
        # chunks — either would otherwise re-jit the full Inception
        # program for a one-off shape.
        for i in range(0, b.shape[0], full):
            chunk = b[i : i + full]
            k = chunk.shape[0]
            if k < full:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], full - k, axis=0)]
                )
            outs.append(np.asarray(fn(jnp.asarray(chunk)))[:k])
    return np.concatenate(outs, axis=0)
