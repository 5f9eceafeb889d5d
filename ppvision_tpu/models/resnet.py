"""ResNet-101 encoder for privacy-preserving captioning (Flax, NHWC).

Same backbone family as the reference's ``Encoder``
(``Image_Caption/models.py:8-54``): torchvision-style ResNet-101 minus
its classification head, followed by an exact adaptive average pool to
``encoded_image_size`` (36).  The adaptive pool is expressed as two
static averaging matmuls (exact torch ``AdaptiveAvgPool2d`` bin
semantics, MXU-friendly).

Pretrained torchvision weights load through
``utils.torch_import`` when a checkpoint file is available; this
environment cannot download them, so fresh inits are random.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ResNetBackbone", "CaptionEncoder", "adaptive_avg_pool"]


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-averaging matrix with torch AdaptiveAvgPool2d bins:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        a = (i * in_size) // out_size
        b = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, a:b] = 1.0 / (b - a)
    return w


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Exact torch adaptive average pool of an NHWC tensor via matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    wr = jnp.asarray(_adaptive_pool_matrix(h, oh), dtype=x.dtype)
    wc = jnp.asarray(_adaptive_pool_matrix(w, ow), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wr, x)
    return jnp.einsum("ow,bhwc->bhoc", wc, x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck, BN after each conv."""

    mid: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        out = self.mid * 4
        residual = x
        if self.project:
            residual = conv(out, (1, 1), strides=(self.stride, self.stride))(x)
            residual = norm()(residual)
        y = conv(self.mid, (1, 1))(x)
        y = nn.relu(norm()(y))
        y = conv(self.mid, (3, 3), strides=(self.stride, self.stride), padding=1)(y)
        y = nn.relu(norm()(y))
        y = conv(out, (1, 1))(y)
        y = norm()(y)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet-v1.5 trunk without the classifier (output stride 32)."""

    stage_sizes: tuple[int, ...] = (3, 4, 23, 3)  # ResNet-101
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        mid = 64
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    mid, stride=stride, project=(b == 0), dtype=self.dtype
                )(x, train=train)
            mid *= 2
        return x  # (B, H/32, W/32, 2048)


class CaptionEncoder(nn.Module):
    """ResNet trunk + adaptive pool to (S, S, 2048), S=36.

    Reference Encoder (models.py:31-41); output layout (B, S, S, 2048).
    Fine-tuning policy (stem+layer1 frozen, reference models.py:43-54)
    is applied in the trainer by masking gradients, not here.
    """

    encoded_image_size: int = 36
    stage_sizes: tuple[int, ...] = (3, 4, 23, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNetBackbone(self.stage_sizes, dtype=self.dtype)(x, train=train)
        s = self.encoded_image_size
        out = adaptive_avg_pool(x, (s, s))
        return out.astype(jnp.promote_types(out.dtype, jnp.float32))
