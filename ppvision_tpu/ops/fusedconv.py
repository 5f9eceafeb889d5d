"""Resample+conv fusions: identical math, fewer FLOPs on the MXU.

The StarGAN-v2 blocks (reference ``core/model.py:58-109``) pair every
3x3 conv with a 2x resample: ``nearest-up -> conv`` in AdainResBlk and
``conv -> avg-pool`` in the downsampling ResBlk.  Both pairs are linear
maps, so each composition collapses into a single (smaller) convolution
on the LOW-resolution side:

- ``nearest2x -> conv3x3(SAME)``: every high-res output phase
  (i%2, j%2) reads a 2x2 window of the low-res input, so the pair is
  four 2x2 convs + depth-to-space.  FLOPs: 4 * (2*4*H*W*I*O) vs
  2*9*(2H)*(2W)*I*O for the naive order — **2.25x fewer**.
- ``conv3x3(SAME) -> avgpool2x``: the pooled output at (a, b) averages
  four conv outputs whose union support is a 4x4 input window at
  stride 2 — one 4x4/s2 conv.  FLOPs: 2*16*(H/2)^2*I*O vs
  2*9*H^2*I*O — **2.25x fewer**.
- 1x1 shortcut convs commute exactly with both resamples (channel-only
  linear map vs spatial-only linear map), so they run on the small side
  — **4x fewer** FLOPs.

The fused kernels are built from the SAME (3,3,I,O) parameter tensor by
summing taps in f32 before the cast to the compute dtype, so results
match the unfused pair up to one bf16 rounding reassociation
(exact in f32 — see tests/test_fusedconv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_nearest_up2x", "conv3x3_avgpool2x"]

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, k, stride=1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), padding, dimension_numbers=_DN
    )


def _f64(x) -> bool:
    # Float64 (the CPU verification goldens): run the UNFUSED order —
    # it matches the torch reference's op order exactly AND avoids
    # XLA-CPU's naive f64 conv loops via ops/cpuconv's matmul form.
    return x.dtype == jnp.float64


def conv3x3_nearest_up2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3(SAME)(nearest_upsample_2x(x))`` as one 4x4/s2
    transposed conv.

    x: (B, H, W, I) NHWC; kernel: (3, 3, I, O) HWIO (f32 master copy —
    the fused kernel is summed in the kernel dtype, then cast to
    ``x.dtype``). Returns (B, 2H, 2W, O); no bias.

    Derivation: with U = nearest-up2x, O(i,j) = sum_{u,v} K[u,v] *
    U(i+u-1, j+v-1) and U(p,q) = x(p//2, q//2); for even i the row taps
    hit x rows (a-1, a) with weights (K[0], K[1]+K[2]); for odd i rows
    (a, a+1) with (K[0]+K[1], K[2]) — same along columns.  Those four
    phase kernels interleave into K4 = [K0, K0+K1, K1+K2, K2] (rows x
    cols), and ``conv_transpose(x, K4, stride 2, pad 2)`` emits exactly
    out(2a+pi) = sum over that phase's taps.  XLA lowers the
    input-dilated conv with its own polyphase rewrite — measured faster
    than a hand-written 4-phase conv + depth-to-space interleave
    (scripts/micro_upconv.py).
    """
    if _f64(x):
        from .cpuconv import conv2d
        from .image import upsample_nearest_2x

        return conv2d(upsample_nearest_2x(x), kernel.astype(x.dtype), (1, 1), "SAME")
    k = kernel
    kr = jnp.stack([k[0], k[0] + k[1], k[1] + k[2], k[2]], 0)  # (4,3,I,O)
    k4 = jnp.stack(
        [kr[:, 0], kr[:, 0] + kr[:, 1], kr[:, 1] + kr[:, 2], kr[:, 2]], 1
    )  # (4,4,I,O)
    return jax.lax.conv_transpose(
        x, k4.astype(x.dtype), (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN
    )


def conv3x3_avgpool2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``avgpool2x(conv3x3(SAME)(x))`` as one 4x4 stride-2 conv.

    x: (B, H, W, I), H and W even; kernel: (3, 3, I, O).  Returns
    (B, H/2, W/2, O); no bias.

    K4[r, c] = 1/4 * sum_{pi, pj in {0,1}} K[r-pi, c-pj] (valid taps),
    window rows 2a-1 .. 2a+2 -> SAME-equivalent padding (1, 1).
    """
    if _f64(x):
        from .cpuconv import conv2d
        from .image import avg_pool_2x

        return avg_pool_2x(conv2d(x, kernel.astype(x.dtype), (1, 1), "SAME"))
    k = kernel
    zr = jnp.zeros_like(k[:1])
    kr = jnp.concatenate([k, zr], 0) + jnp.concatenate([zr, k], 0)  # (4,3,I,O)
    zc = jnp.zeros_like(kr[:, :1])
    k4 = jnp.concatenate([kr, zc], 1) + jnp.concatenate([zc, kr], 1)  # (4,4,I,O)
    k4 = (k4 * 0.25).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k4, (2, 2), ((1, 1), (1, 1)), dimension_numbers=_DN
    )
