"""Memory-efficient local correlation (RAFT ``alt_cuda_corr`` equivalent).

The reference ships a CUDA kernel (``Face-DeId/RAFT/alt_cuda_corr/
correlation_kernel.cu``) that avoids materializing the B*(HW)^2
all-pairs volume by computing, per query pixel, dot products of its
feature vector with a bilinear-sampled (2r+1)^2 window of the second
feature map.  This module provides the TPU-native equivalents:

- :func:`local_corr_xla` — vectorized gather + einsum (works on every
  backend; also the autodiff path).
- :func:`local_corr_pallas` — a Pallas TPU kernel: the second feature
  map stays VMEM-resident (zero-padded so windows are always in
  bounds), and each query pixel does one (K+1)^2 x C window-dot on the
  MXU followed by the 4-corner bilinear combination of the score grid.
- :func:`local_corr` — custom-VJP wrapper: Pallas forward on TPU, XLA
  backward (the gradients match the CUDA backward semantics because
  both differentiate the same bilinear-weighted dot).

``alternate_corr_lookup`` composes the per-level calls the way
``AlternateCorrBlock`` does (corr.py:63-91): fmap2 is average-pooled
per level (an approximation of pooling the correlation volume, as in
the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["local_corr", "local_corr_xla", "local_corr_pallas", "alternate_corr_lookup"]


# ---------------------------------------------------------------------------
# XLA implementation (all backends; used for gradients).
# ---------------------------------------------------------------------------


def local_corr_xla(
    fmap1: jnp.ndarray,  # (B, H, W, C) query features
    fmap2: jnp.ndarray,  # (B, H2, W2, C) target features (this level)
    coords: jnp.ndarray,  # (B, H, W, 2) (x, y) centers in fmap2 pixels
    radius: int = 4,
) -> jnp.ndarray:
    """(B, H, W, (2r+1)^2) windowed bilinear correlation."""
    b, h, w, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    r = radius
    k = 2 * r + 1
    dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1), indexing="ij")
    delta = jnp.asarray(np.stack([dx, dy], -1).reshape(1, 1, 1, k * k, 2), jnp.float32)

    pts = coords[:, :, :, None, :] + delta  # (B, H, W, K^2, 2)
    x, y = pts[..., 0], pts[..., 1]
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0

    def gather_dot(yy, xx):
        valid = (xx >= 0) & (xx <= w2 - 1) & (yy >= 0) & (yy <= h2 - 1)
        xi = jnp.clip(xx, 0, w2 - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h2 - 1).astype(jnp.int32)
        bidx = jnp.arange(b).reshape(b, 1, 1, 1)
        vals = fmap2[bidx, yi, xi]  # (B, H, W, K^2, C)
        dots = jnp.einsum(
            "bhwkc,bhwc->bhwk", vals, fmap1,
            precision=jax.lax.Precision.HIGHEST,  # f32 like the CUDA ref
        )
        return dots * valid

    out = (
        gather_dot(y0, x0) * (1 - wx) * (1 - wy)
        + gather_dot(y0, x0 + 1) * wx * (1 - wy)
        + gather_dot(y0 + 1, x0) * (1 - wx) * wy
        + gather_dot(y0 + 1, x0 + 1) * wx * wy
    )
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel.
# ---------------------------------------------------------------------------


def _load_width(radius: int) -> int:
    """8-aligned-load width covering offset (0..7) + K+1 window columns."""
    k1 = 2 * radius + 2
    return ((8 + k1 + 7) // 8) * 8


def _corr_kernel(f1_ref, f2p_ref, coords_ref, out_ref, *, radius: int, h2: int, w2: int):
    from jax.experimental import pallas as pl

    r = radius
    k = 2 * r + 1
    wq = f1_ref.shape[2]  # query row width
    c = f1_ref.shape[3]
    pad_lo = 2 * r + 1
    lw = _load_width(r)

    def body(j, _):
        x = coords_ref[0, 0, j, 0]
        y = coords_ref[0, 0, j, 1]
        # Clamp to the exact all-zero boundary: at y = -(r+1) or h2+r the
        # true windowed correlation is already all zeros (every sampled
        # corner lies in zero padding), so clamping further-out coords
        # there preserves exact semantics while keeping slices in range.
        x = jnp.clip(x, -float(r + 1), float(w2 + r))
        y = jnp.clip(y, -float(r + 1), float(h2 + r))
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        sy = y0.astype(jnp.int32) - r + pad_lo
        sx = x0.astype(jnp.int32) - r + pad_lo
        # Mosaic requires the width (sublane) slice start to be 8-aligned:
        # load from the aligned floor and select columns by one-hot matmul.
        sx8 = pl.multiple_of((sx // 8) * 8, 8)
        off = sx - sx8

        window = f2p_ref[0, pl.ds(sy, k + 1), pl.ds(sx8, lw), :]  # (K+1, lw, C)
        f1j = f1_ref[0, 0, j, :]
        # HIGHEST: f32 multi-pass on the MXU — the reference kernel is
        # plain f32 CUDA (correlation_kernel.cu:19-119); default
        # precision would round the operands to bf16 (~3e-3 rel err,
        # measured on-chip).
        scores_full = jax.lax.dot_general(
            window.reshape((k + 1) * lw, c),
            f1j[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(k + 1, lw)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lw, k + 1), 0)
        tgt = off + jax.lax.broadcasted_iota(jnp.int32, (lw, k + 1), 1)
        sel = (cols == tgt).astype(jnp.float32)
        scores = jax.lax.dot_general(
            scores_full, sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K+1, K+1)
        corr = (
            (1 - fy) * (1 - fx) * scores[:k, :k]
            + (1 - fy) * fx * scores[:k, 1:]
            + fy * (1 - fx) * scores[1:, :k]
            + fy * fx * scores[1:, 1:]
        )
        # Store the (K, K) grid directly; flattening to K^2 would be a
        # sublane->lane relayout Mosaic rejects. Flattened outside.
        out_ref[0, 0, j, :, :] = corr
        return 0

    jax.lax.fori_loop(0, wq, body, 0)


def local_corr_pallas(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas forward of :func:`local_corr_xla` (same outputs)."""
    from jax.experimental import pallas as pl

    b, h, w, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    r = radius
    k = 2 * r + 1
    pad_lo, pad_hi = 2 * r + 1, 2 * r + 2
    # Width needs extra room: loads start at the 8-aligned floor and
    # span _load_width columns.
    pad_hi_w = pad_hi + _load_width(r)
    # Zero-pad so every window load is in bounds (see the clamp-boundary
    # argument in the kernel).
    f2p = jnp.pad(fmap2, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi_w), (0, 0)))

    kernel = partial(_corr_kernel, radius=r, h2=h2, w2=w2)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, h2 + pad_lo + pad_hi, w2 + pad_lo + pad_hi_w, c),
                lambda bi, i: (bi, 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, w, 2), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, w, k, k), lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, k, k), jnp.float32),
        interpret=interpret,
    )(fmap1, f2p, coords).reshape(b, h, w, k * k)


# ---------------------------------------------------------------------------
# custom-VJP wrapper + AlternateCorrBlock composition.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def local_corr(fmap1, fmap2, coords, radius: int = 4):
    """Windowed correlation: Pallas forward on TPU, XLA elsewhere."""
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return local_corr_xla(fmap1, fmap2, coords, radius)
    return local_corr_pallas(fmap1, fmap2, coords, radius)


def _fwd(fmap1, fmap2, coords, radius):
    return local_corr(fmap1, fmap2, coords, radius), (fmap1, fmap2, coords)


def _bwd(radius, res, g):
    fmap1, fmap2, coords = res
    _, vjp = jax.vjp(lambda a, b, c: local_corr_xla(a, b, c, radius), fmap1, fmap2, coords)
    return vjp(g)


local_corr.defvjp(_fwd, _bwd)


def alternate_corr_lookup(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    num_levels: int = 4,
    radius: int = 4,
) -> jnp.ndarray:
    """AlternateCorrBlock (reference corr.py:63-91): per level, pool
    fmap2 2x and correlate the ORIGINAL-resolution fmap1 window around
    coords/2^l; concat levels; scale by 1/sqrt(C)."""
    from .image import avg_pool_2x

    b, h, w, c = fmap1.shape
    out = []
    f2 = fmap2
    for i in range(num_levels):
        out.append(local_corr(fmap1, f2, coords / (2**i), radius))
        f2 = avg_pool_2x(f2)
    return jnp.concatenate(out, axis=-1) / jnp.sqrt(jnp.float32(c))
