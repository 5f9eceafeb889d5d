"""RAFT optical flow (Flax, NHWC) for the temporal-consistency loss.

Same architecture family as the reference RAFT
(``Face-DeId/RAFT/core/{raft,extractor,corr,update}.py``): BasicEncoder
feature/context nets, all-pairs correlation pyramid with bilinear
radius-4 lookup, SepConvGRU update block, convex 8x flow upsampling,
12-20 refinement iterations.

TPU-first structure:

- the refinement loop is a ``lax.scan`` (static iteration count,
  raft.py:123-140);
- the correlation pyramid is one batched matmul + mean-pooling; the
  lookup is a vectorized bilinear gather (corr.py:12-60);
- the memory-efficient on-demand correlation (the reference's
  ``alt_cuda_corr`` CUDA kernel) lives in
  :mod:`ppvision_tpu.ops.corr` with a Pallas TPU kernel;
- the batched flow loss (``loss_RAFT``, core/utils.py:437-462) runs
  the whole batch at once instead of per-sample Python loops.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.image import avg_pool_2x, resize_bilinear

__all__ = ["RAFT", "raft_flow_loss", "bilinear_sampler", "upflow8"]


# ---------------------------------------------------------------------------
# Sampling helpers.
# ---------------------------------------------------------------------------


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup of NHWC ``img`` at pixel ``coords`` (..., 2) = (x, y),
    zeros outside (torch grid_sample align_corners=True + zero padding)."""
    h, w = img.shape[-3], img.shape[-2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(img.shape[0]).reshape(
            (-1,) + (1,) * (coords.ndim - 2)
        )
        vals = img[batch_idx, yi, xi]
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


def coords_grid(batch: int, h: int, w: int) -> jnp.ndarray:
    """(B, H, W, 2) grid of (x, y) pixel coordinates."""
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    return jnp.broadcast_to(grid, (batch, h, w, 2))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear upsample of an NHWC flow field, values scaled by 8."""
    h, w = flow.shape[-3] * 8, flow.shape[-2] * 8
    return 8.0 * resize_bilinear(flow, (h, w), align_corners=True)


# ---------------------------------------------------------------------------
# Correlation pyramid (CorrBlock, corr.py:12-60).
# ---------------------------------------------------------------------------


def build_corr_pyramid(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4
) -> list[jnp.ndarray]:
    """All-pairs correlation -> list of (B*H1*W1, H2/2^l, W2/2^l, 1)."""
    b, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    corr = jnp.einsum(
        "bxyc,buvc->bxyuv", fmap1, fmap2, precision=jax.lax.Precision.HIGHEST
    ) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b * h1 * w1, h2, w2, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool_2x(corr)
        pyramid.append(corr)
    return pyramid


def lookup_corr_pyramid(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Radius-r bilinear lookup at each level -> (B, H, W, L*(2r+1)^2)."""
    b, h, w, _ = coords.shape
    r = radius
    # The reference adds its meshgrid's SLOW axis to x and FAST axis to y
    # (corr.py:37-43: centroid (x,y) + stack(meshgrid(dy,dx))), so the
    # K^2 channel order is x-major; keep that exact layout so converted
    # update-block weights line up.
    # Dense separable interpolation instead of per-point gathers: the
    # hat function max(0, 1-|x-q|) over grid columns q IS zero-padded
    # bilinear sampling, so the 9x9 window lookup becomes two tiny
    # batched matmuls per level. Element gathers inside the refinement
    # loop measured ~160 ms EACH on TPU (scalar HBM access); the dense
    # form is VPU/MXU work on ~10 MFLOP operands.
    off = jnp.arange(-r, r + 1, dtype=jnp.float32)
    n = b * h * w
    cx = coords.reshape(n, 2)[:, 0]
    cy = coords.reshape(n, 2)[:, 1]
    out = []
    for i, corr in enumerate(pyramid):
        hl, wl = corr.shape[1], corr.shape[2]
        sx = cx / (2**i)
        sy = cy / (2**i)
        q = jnp.arange(wl, dtype=jnp.float32)
        p = jnp.arange(hl, dtype=jnp.float32)
        wcol = jnp.maximum(
            0.0, 1.0 - jnp.abs(sx[:, None, None] + off[None, :, None] - q[None, None, :])
        )  # (N, K, Wl): weight of column q for x-offset a
        wrow = jnp.maximum(
            0.0, 1.0 - jnp.abs(sy[:, None, None] + off[None, :, None] - p[None, None, :])
        )  # (N, K, Hl)
        t = jnp.einsum(
            "npq,naq->nap", corr[..., 0], wcol, precision=jax.lax.Precision.HIGHEST
        )
        # sampled[n, a, b] = corr at (row cy+off[b], col cx+off[a]) —
        # x-major K^2 order, matching the reference layout above.
        sampled = jnp.einsum(
            "nap,nbp->nab", t, wrow, precision=jax.lax.Precision.HIGHEST
        )
        out.append(sampled.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Networks.
# ---------------------------------------------------------------------------


class _Norm(nn.Module):
    kind: str  # 'instance' | 'batch' | 'none'

    @nn.compact
    def __call__(self, x):
        if self.kind == "instance":
            # torch InstanceNorm2d default: affine=False.
            mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
            var = jnp.var(x, axis=(-3, -2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.kind == "batch":
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            mean = self.param("mean", nn.initializers.zeros, (c,))
            var = self.param("var", nn.initializers.ones, (c,))
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return x


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1)(x)
        y = nn.relu(_Norm(self.norm)(y))
        y = nn.Conv(self.planes, (3, 3), padding=1)(y)
        y = nn.relu(_Norm(self.norm)(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2)(x)
            x = _Norm(self.norm)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature/context trunk at 1/8 resolution (extractor.py:118-192)."""

    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3)(x)
        x = nn.relu(_Norm(self.norm)(x))
        for dim, stride in ((64, 1), (96, 2), (128, 2)):
            x = ResidualBlock(dim, self.norm, stride)(x)
            x = ResidualBlock(dim, self.norm, 1)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


class BasicMotionEncoder(nn.Module):
    corr_planes: int

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1))(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1)(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3)(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1)(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1)(jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for k, pad in (((1, 5), ((0, 0), (2, 2))), ((5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(nn.Conv(self.hidden, k, padding=pad)(hx))
            r = jax.nn.sigmoid(nn.Conv(self.hidden, k, padding=pad)(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden, k, padding=pad)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_planes)(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden)(net, inp)
        # Flow head.
        f = nn.relu(nn.Conv(256, (3, 3), padding=1)(net))
        delta = nn.Conv(2, (3, 3), padding=1)(f)
        # Convex-upsampling mask, scaled .25 to balance gradients.
        m = nn.relu(nn.Conv(256, (3, 3), padding=1)(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1))(m)
        return net, mask, delta


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex combination 8x upsampling (raft.py:74-85), NHWC."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 1, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=4)

    # 3x3 neighborhoods of 8*flow: (B, H, W, 2, 9).
    pad = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [
            pad[:, i : i + h, j : j + w, :]
            for i in range(3)
            for j in range(3)
        ],
        axis=-1,
    )
    up = jnp.sum(mask * patches[:, :, :, :, :, None, None], axis=4)
    # (B, H, W, 2, 8, 8) -> (B, H*8, W*8, 2)
    up = jnp.transpose(up, (0, 1, 4, 2, 5, 3))
    return up.reshape(b, h * 8, w * 8, 2)


class RAFT(nn.Module):
    """Full-size RAFT; images NHWC in [0, 255]."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    # Memory-efficient on-demand correlation (the reference's
    # --alternate_corr / alt_cuda_corr path, RAFT/core/corr.py:63-91):
    # skip the O((HW)^2) dense pyramid and compute each window with the
    # ops.corr kernel (Pallas on TPU).  Numerically equivalent to the
    # dense path (pooling fmap2 commutes with the dot; channel order
    # re-laid to match) — tests/test_raft.py.
    alternate_corr: bool = False

    @nn.compact
    def __call__(self, image1, image2, iters: int | None = None):
        iters = iters or self.iters
        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        fnet = BasicEncoder(256, "instance", name="fnet")
        both = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        pyramid = (
            None
            if self.alternate_corr
            else build_corr_pyramid(fmap1, fmap2, self.corr_levels)
        )

        cnet = BasicEncoder(self.hidden_dim + self.context_dim, "batch", name="cnet")(
            image1
        )
        net, inp = jnp.split(cnet, [self.hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        b, h, w = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(b, h, w)

        corr_planes = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        update = BasicUpdateBlock(corr_planes, self.hidden_dim, name="update_block")

        def body(mdl, carry, _):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            if self.alternate_corr:
                from ..ops.corr import alternate_corr_lookup

                kk = 2 * self.corr_radius + 1
                corr = alternate_corr_lookup(
                    fmap1, fmap2, coords1, self.corr_levels, self.corr_radius
                )
                # ops.corr emits (dy, dx)-ordered K^2 blocks; the dense
                # pyramid path (and converted update-block weights) use
                # (dx, dy) — swap within each level.
                bq, hq, wq = corr.shape[:3]
                corr = corr.reshape(bq, hq, wq, self.corr_levels, kk, kk)
                corr = jnp.swapaxes(corr, -1, -2).reshape(bq, hq, wq, -1)
            else:
                corr = lookup_corr_pyramid(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = convex_upsample(coords1 - coords0, mask)
            return (net, coords1), flow_up

        (net, coords1), flows = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )(update, (net, coords0), None)
        # flows: (iters, B, H*8, W*8, 2); final prediction last.
        return flows[-1]


def raft_flow_loss(
    raft: RAFT, params: Any, frames1: jnp.ndarray, frames2: jnp.ndarray,
    iters: int = 20,
) -> jnp.ndarray:
    """Temporal-consistency loss: sum over batch of |mean(flow)| between
    masked frame pairs (reference loss_RAFT.__call__, utils.py:460-462),
    batched instead of per-sample."""
    flow = raft.apply({"params": params}, frames1, frames2, iters=iters)
    return jnp.sum(jnp.abs(jnp.mean(flow, axis=(1, 2, 3))))
