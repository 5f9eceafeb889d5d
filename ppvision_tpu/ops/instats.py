"""Two-moment InstanceNorm statistics as a Pallas streaming kernel.

XLA's channels-last (H, W)-axis reductions on v5e run far below HBM
bandwidth (measured 114-269 GB/s vs the 819 GB/s peak;
/tmp and PERF.md round-5b) — the encoder's InstanceNorm stat passes
cost ~10 ms of the 45 ms bench front-end.  This kernel streams the
tensor once per grid step, accumulating sum and sum-of-squares in f32
over the (H, W) axes entirely in VMEM.

Numerics: identical to ``jnp.mean(xf, (1, 2))`` / ``jnp.mean(xf*xf,
(1, 2))`` up to f32 accumulation order (jnp divides the f32 sum by n
the same way).  Gradients replay the jnp formulation's VJP (custom
VJP, same pattern as ops/winograd.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["instance_moments", "instance_moments_eligible"]


def _moments_ref(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The jnp formulation (what InstanceNorm inlines today)."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    return jnp.mean(xf, axis=(1, 2)), jnp.mean(xf * xf, axis=(1, 2))


def instance_moments_eligible(x: jnp.ndarray) -> bool:
    """Default OFF: measured SLOWER than XLA's reduce at every bench
    shape (117 vs 183 GB/s at 64^2x256, 158 vs 312 at 128^2x128, parity
    at 16^2 — PERF.md round-5b).  The backend's per-step block DMA
    pipelining tops out below the XLA reduce emitter's streaming rate,
    so the encoder's ~10 ms of stat passes are at this backend's
    achievable reduce bandwidth already.  Opt-in: PPVISION_PALLAS_INSTATS=1."""
    if os.environ.get("PPVISION_PALLAS_INSTATS", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 4 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    b, h, w, c = x.shape
    per_img = h * w * c * x.dtype.itemsize
    return (
        c % 128 == 0
        and h * w >= 64
        and per_img <= 8 * 2**20
        and b * h * w * c >= 2**20  # tiny tensors: jnp reduce is fine
    )


def _plan(b: int, per_img_bytes: int) -> int:
    bb = 1
    # Deep enough blocks to pipeline HBM streams; cap VMEM at ~16 MB.
    while bb < b and b % (2 * bb) == 0 and (2 * bb) * per_img_bytes <= 16 * 2**20:
        bb *= 2
    return bb


def _kernel(x_ref, s_ref, s2_ref, *, hw: int):
    xf = x_ref[:].astype(jnp.float32)  # [bb, H, W, C]
    s_ref[:] = (jnp.sum(xf, axis=(1, 2)) / hw)[None]
    s2_ref[:] = (jnp.sum(xf * xf, axis=(1, 2)) / hw)[None]


def _impl(x, interpret: bool = False):
    b, h, w, c = x.shape
    bb = _plan(b, h * w * c * x.dtype.itemsize)
    body = functools.partial(_kernel, hw=h * w)
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    except TypeError:
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 2**20)
    # Outputs viewed (B/bb, bb, C): each grid step owns one full
    # leading slice, so the (bb, C) trailing block dims equal the array
    # dims — Mosaic's sublane-divisibility rule is satisfied for any bb.
    m, m2 = pl.pallas_call(
        body,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b // bb, bb, c), jnp.float32),
            jax.ShapeDtypeStruct((b // bb, bb, c), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(x)
    return m.reshape(b, c), m2.reshape(b, c)


def _make(interpret: bool):
    @jax.custom_vjp
    def f(x):
        m, m2 = _impl(x, interpret=interpret)
        return m, m2

    def fwd(x):
        return f(x), x

    def bwd(x, g):
        _, vjp = jax.vjp(_moments_ref, x)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


_moments = _make(interpret=False)
_moments_interp = _make(interpret=True)


def instance_moments(
    x: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, mean-of-squares) over the (H, W) axes of an NHWC tensor,
    f32, shape (B, C) each.  Pallas-streamed on TPU for eligible
    shapes; callers gate on ``instance_moments_eligible``."""
    return (_moments_interp if interpret else _moments)(x)
