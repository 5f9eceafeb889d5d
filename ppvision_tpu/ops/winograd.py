"""Winograd F(2,3)-along-H fused 3x3 convolution (Pallas TPU kernel).

The decode/encode hot path is stride-1 SAME 3x3 convs (StarGAN blocks,
reference ``core/model.py:58-109``); on TPU v5e they run at ~97% of the
measured MXU ceiling, so the only way past the roofline is to do fewer
multiplies.  Winograd F(2,3) applied along H only (direct 3-tap along W)
needs 4 multiplies per 2 output rows instead of 6 — **1.5x fewer MXU
FLOPs**.  Measured on v5e it does NOT pay (see ``winograd_eligible``
and PERF.md round-2f), so it ships OFF by default; the kernel keeps
every data movement Mosaic-friendly:

- H-parity split and row interleave are *leading-dim* reshapes (free on
  TPU: only the last two dims are tiled);
- the W taps are contiguous +-1 *sublane offsets* (cheap) — no strided
  slicing, no gather, no relayout (full 2D F(2x2,3x3) would need
  stride-2 sublane access, which Mosaic lowers to unsupported gathers);
- the 12 tap-matmuls ride the MXU as ``[bb*T*W, C] @ [C, K]`` with f32
  accumulation.

Numerics: the input transform (sums of <=2 bf16 values) and the inverse
transform run in f32; transformed operands are rounded to bf16 once
before the MXU — the same single input rounding the direct bf16 conv
performs, so error is direct-conv-comparable (see
tests/test_winograd.py).  The kernel transform G = [[1,0,0],
[.5,.5,.5],[.5,-.5,.5],[0,0,1]] is exact in f32 (0.5 = exponent shift).

Gradients: a custom VJP replays ``jax.vjp`` of the plain lax conv (the
unused primal is DCE'd by XLA), so training through this op uses XLA's
native conv transpose rules.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "winograd_eligible"]

# G for F(2,3): transforms the 3-tap kernel to the 4-point Winograd domain.
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)


def _lax_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Reference path: plain stride-1 SAME 3x3 conv (NHWC, HWIO)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def winograd_eligible(x: jnp.ndarray, features: int) -> bool:
    """True when the Pallas kernel supports (and should take) this shape."""
    if os.environ.get("PPVISION_WINOGRAD", "0") != "1":
        # Default OFF: on TPU v5e the measured win is at best ~1.05x on
        # the C=512 shapes and a 0.7x LOSS at C=128 — the VPU cost of
        # the sublane-shifted tap operands plus the HBM round-trip eats
        # the 1.5x MXU saving (see PERF.md round-2f).  Kept as opt-in
        # infrastructure: on hardware with a higher MXU:VPU ratio (or a
        # Mosaic that lowers strided sublane access natively, enabling
        # the full 2.25x 2D form) flip PPVISION_WINOGRAD=1.
        return False
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    b, h, w, c = x.shape
    return (
        c % 128 == 0
        and features % 128 == 0
        and h % 2 == 0
        and h >= 4
        and w % 16 == 0
        and w <= 512
    )


def _plan(b: int, h: int, w: int) -> tuple[int, int]:
    """(bb images per block, T = H/2 tile-rows): target MXU M>=512."""
    t = h // 2
    bb = 1
    while bb * t * w < 512 and b % (2 * bb) == 0:
        bb *= 2
    return bb, t


def _kernel(x_ref, u_ref, o_ref, *, bb: int, t: int, h: int, w: int):
    """One whole (padded) image group per grid step.

    All four Winograd phases are materialized in VMEM as bf16 once, so
    each of the 12 tap-matmuls runs at M = bb * H/2 * W rows — big
    enough to saturate the MXU pipeline (per-strip loops measured
    59-102 TF/s; whole-image dots reach the direct-conv rate on 1.5x
    fewer FLOPs).
    """
    f32 = jnp.float32
    rows = x_ref[:]  # [bb, H+2, W+2, C]
    v = rows.reshape(bb, t + 1, 2, w + 2, rows.shape[-1])  # leading split: free
    ev, od = v[:, :, 0].astype(f32), v[:, :, 1].astype(f32)
    d0, d1, d2, d3 = ev[:, :t], od[:, :t], ev[:, 1:], od[:, 1:]
    # B^T d for F(2,3): the four Winograd input phases along H (bf16 for
    # the MXU — the one input rounding the direct bf16 conv also pays).
    phases = (
        (d0 - d2).astype(jnp.bfloat16),
        (d1 + d2).astype(jnp.bfloat16),
        (d2 - d1).astype(jnp.bfloat16),
        (d1 - d3).astype(jnp.bfloat16),
    )
    # Accumulate A^T m directly (y0 = m0+m1+m2, y1 = m1-m2-m3): two f32
    # accumulators instead of four phase outputs.
    y0 = None
    y1 = None
    for u in range(4):
        vu = phases[u]  # [bb,T,W+2,C]
        acc = None
        for j in range(3):  # direct 3-tap along W: contiguous sublane offsets
            lhs = vu[:, :, j : j + w, :].reshape(bb * t * w, vu.shape[-1])
            d = jnp.dot(lhs, u_ref[u, j], preferred_element_type=f32)
            acc = d if acc is None else acc + d
        if u < 3:
            y0 = acc if y0 is None else y0 + acc
        if u == 1:
            y1 = acc
        elif u > 1:
            y1 = y1 - acc
    k = y0.shape[-1]
    y0 = y0.reshape(bb, t, w, k)
    y1 = y1.reshape(bb, t, w, k)
    # Row interleave is a leading-dim reshape: free.
    y = jnp.stack([y0, y1], axis=2).reshape(bb, 2 * t, w, k)
    o_ref[:] = y.astype(o_ref.dtype)


def _winograd_impl(x: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False):
    b, h, w, c = x.shape
    k = kernel.shape[-1]
    bb, t = _plan(b, h, w)
    # Kernel transform: U[u, j] = sum_i G[u, i] kernel[i, j]  (f32-exact).
    u = jnp.einsum("ui,ijck->ujck", jnp.asarray(_G), kernel.astype(jnp.float32))
    u = u.astype(jnp.bfloat16)
    # SAME padding folds into the producing fusion on the XLA side.
    x_p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    body = functools.partial(_kernel, bb=bb, t=t, h=h, w=w)
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    except TypeError:  # older naming
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 2**20)
    return pl.pallas_call(
        body,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 3, c, k), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, h, w, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, k), x.dtype),
        compiler_params=params,
        interpret=interpret,
    )(x_p, u)


@jax.custom_vjp
def _winograd_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return _winograd_impl(x, kernel)


def _winograd_fwd(x, kernel):
    return _winograd_conv(x, kernel), (x, kernel)


def _winograd_bwd(res, g):
    x, kernel = res
    # XLA's native conv transpose rules; the forward primal is dead code.
    _, vjp = jax.vjp(_lax_conv3x3, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


_winograd_conv.defvjp(_winograd_fwd, _winograd_bwd)


def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv (NHWC x HWIO, no bias), Winograd-fused on
    TPU for bf16 MXU-aligned shapes, plain lax conv otherwise.

    Set ``PPVISION_WINOGRAD=0`` to force the lax path everywhere.
    """
    if winograd_eligible(x, kernel.shape[-1]):
        return _winograd_conv(x, kernel)
    return _lax_conv3x3(x, kernel)
