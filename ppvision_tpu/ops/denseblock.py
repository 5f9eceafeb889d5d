"""Fused FAN DenseConvBlock (Pallas TPU kernel).

The FAN stage is bandwidth-bound (PERF.md: 31 ms at bench shapes vs a
~23 ms unfused logical-bytes floor), and most of its traffic is the
hourglass ``DenseConvBlock`` chain (reference ``core/wing.py:139-175``):
three BN-relu-conv3x3 stages whose outputs concatenate, plus a residual
add.  Unfused, each block makes ~6 HBM round-trips over 64^2-and-below
feature maps; this kernel runs the WHOLE block in one pallas_call —
read x once, write the concat+residual output once — so the block's
logical HBM traffic drops ~2.4x and the inter-op fusion/relayout
overhead disappears.

Mosaic-friendly movement only:

- SAME padding for each stage is a zero-bordered VMEM scratch; the
  border is zeroed once (grid step 0) and only the interior is
  rewritten per step.
- the 9 conv taps are (dy, dx) slices of the padded scratch — H
  offsets are free leading-dim slices, W offsets are +-1 sublane
  slices (same pattern as ops/winograd.py);
- each tap is one MXU matmul ``[bb*H*W, Cin] @ [Cin, Cout]`` with f32
  accumulation.

Numerics: identical op-for-op to the unfused block (BN scale/shift and
relu in bf16 exactly as ``FrozenBatchNorm``; convs accumulate f32 and
round to bf16 once) up to tap-order reassociation of the conv sums —
direct-bf16-conv error scale (see tests/test_denseblock.py).

Gradients: FAN only ever runs frozen/eval (the reference never
optimizes it, solver.py:60-62); a custom VJP replays the unfused
block's VJP for completeness, mirroring ops/winograd.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dense_block", "dense_block_eligible", "dense_block_ref"]


def _bn_relu(x, mul, add):
    """FrozenBatchNorm (folded scale/shift, compute dtype) + relu."""
    return jnp.maximum(x * mul.astype(x.dtype) + add.astype(x.dtype), 0)


def dense_block_ref(x, k1, k2, k3, bn1, bn2, bn3):
    """Unfused reference: the exact op sequence models/fan.py runs for a
    non-pooling DenseConvBlock with in_features == features."""

    def conv(h, k):
        return jax.lax.conv_general_dilated(
            h, k.astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    o1 = conv(_bn_relu(x, *bn1), k1)
    o2 = conv(_bn_relu(o1, *bn2), k2)
    o3 = conv(_bn_relu(o2, *bn3), k3)
    return jnp.concatenate([o1, o2, o3], axis=-1) + x


def dense_block_eligible(x: jnp.ndarray, features: int) -> bool:
    """True when the fused Pallas block supports (and should take) this
    shape: bf16 NHWC, in == out features, MXU/lane-friendly dims.

    Default OFF: measured ~5.5 ms/block at the 64^2x256 bench shape vs
    ~4.8 ms for XLA's in-context unfused chain — the end-to-end bench
    LOST 1% with the fusion on (5,176 vs 5,227 img/s, PERF.md round-5).
    XLA's conv emitter + fusion scheduler already covers the block's
    bandwidth win; the Pallas 9-tap form pays more in sublane-shifted
    tap materialization than it saves in HBM traffic.  Kept as opt-in
    (`PPVISION_FUSED_FAN=1`) infrastructure for backends with weaker
    conv fusion."""
    if os.environ.get("PPVISION_FUSED_FAN", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    b, h, w, c = x.shape
    return (
        c == features
        and features % 4 == 0
        # Measured on v5e (scripts/bench_denseblock.py): the fusion wins
        # only where the per-image map is large AND lanes stay full —
        # 64^2 x 256.  At 32^2-and-below the unfused chain is already
        # compute-dense (0.84-1.01x), and 128-channel blocks pay
        # half-empty lanes in the o2/o3 dots (0.52x).
        and features >= 256
        and h * w >= 64 * 64
        and w % 8 == 0
        and h * w * c <= 64 * 64 * 256  # VMEM budget per image
    )


def _plan(b: int, h: int, w: int) -> int:
    """bb images per grid step: target M = bb*H*W >= 2048 rows."""
    env = os.environ.get("PPVISION_DB_BB")
    if env:
        return min(int(env), b)
    bb = 1
    while bb * h * w < 2048 and b % (2 * bb) == 0:
        bb *= 2
    return bb


def _conv9(h_ref, k_ref, bb, h, w, cin, cout):
    """9-tap SAME conv from a zero-bordered padded scratch: f32 acc."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = h_ref[:, dy : dy + h, dx : dx + w, :].reshape(bb * h * w, cin)
            d = jnp.dot(lhs, k_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc.reshape(bb, h, w, cout)


def _kernel(
    x_ref, k1_ref, k2_ref, k3_ref, bn_ref,
    o_ref, h1_ref, h2_ref, h3_ref,
    *, bb: int, h: int, w: int, f: int,
):
    half, quarter = f // 2, f // 4
    bf16 = jnp.bfloat16

    @pl.when(pl.program_id(0) == 0)
    def _zero_borders():
        # Zero the padding borders once; interior writes below never
        # touch them, so they stay zero for every grid step.
        for ref in (h1_ref, h2_ref, h3_ref):
            c = ref.shape[-1]
            ref[:, 0, :, :] = jnp.zeros((bb, w + 2, c), bf16)
            ref[:, h + 1, :, :] = jnp.zeros((bb, w + 2, c), bf16)
            ref[:, :, 0, :] = jnp.zeros((bb, h + 2, c), bf16)
            ref[:, :, w + 1, :] = jnp.zeros((bb, h + 2, c), bf16)

    x = x_ref[:]  # [bb, H, W, F] bf16
    # bn_ref: [6, F] f32 rows = (mul1, add1, mul2, add2, mul3, add3),
    # each padded with zeros past its true channel count.
    h1_ref[:, 1 : h + 1, 1 : w + 1, :] = _bn_relu(
        x, bn_ref[0, :f], bn_ref[1, :f]
    )
    o1 = _conv9(h1_ref, k1_ref, bb, h, w, f, half)
    o1b = o1.astype(bf16)
    h2_ref[:, 1 : h + 1, 1 : w + 1, :] = _bn_relu(
        o1b, bn_ref[2, :half], bn_ref[3, :half]
    )
    o2 = _conv9(h2_ref, k2_ref, bb, h, w, half, quarter)
    o2b = o2.astype(bf16)
    h3_ref[:, 1 : h + 1, 1 : w + 1, :] = _bn_relu(
        o2b, bn_ref[4, :quarter], bn_ref[5, :quarter]
    )
    o3 = _conv9(h3_ref, k3_ref, bb, h, w, quarter, quarter)
    # concat([o1, o2, o3]) + x, written channel-range by channel-range.
    o_ref[:, :, :, :half] = o1b + x[..., :half]
    o_ref[:, :, :, half : half + quarter] = o2b + x[..., half : half + quarter]
    o_ref[:, :, :, half + quarter :] = (
        o3.astype(bf16) + x[..., half + quarter :]
    )


def _impl(x, k1, k2, k3, bn, interpret: bool = False):
    b, h, w, f = x.shape
    half, quarter = f // 2, f // 4
    bb = _plan(b, h, w)
    body = functools.partial(_kernel, bb=bb, h=h, w=w, f=f)
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20)
    except TypeError:  # older naming
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=110 * 2**20)
    kspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        body,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, h, w, f), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            kspec(), kspec(), kspec(), kspec(),
        ],
        out_specs=pl.BlockSpec(
            (bb, h, w, f), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, h + 2, w + 2, f), jnp.bfloat16),
            pltpu.VMEM((bb, h + 2, w + 2, half), jnp.bfloat16),
            pltpu.VMEM((bb, h + 2, w + 2, quarter), jnp.bfloat16),
        ],
        compiler_params=params,
        interpret=interpret,
    )(x, k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
      k3.astype(jnp.bfloat16), bn)


def _pack_bn(bn1, bn2, bn3, f: int) -> jnp.ndarray:
    """Stack the three (mul, add) pairs into one zero-padded [6, F] f32."""
    rows = []
    for mul, add in (bn1, bn2, bn3):
        for v in (mul, add):
            v = v.astype(jnp.float32)
            rows.append(jnp.pad(v, (0, f - v.shape[0])))
    return jnp.stack(rows)


def _fused_bwd(res, g):
    x, k1, k2, k3, bns = res
    ref = lambda x, k1, k2, k3, *bn: dense_block_ref(
        x, k1, k2, k3, bn[0:2], bn[2:4], bn[4:6]
    )
    _, vjp = jax.vjp(ref, x, k1, k2, k3, *bns)
    return vjp(g.astype(x.dtype))


def _make_fused(interpret: bool):
    @jax.custom_vjp
    def fused(x, k1, k2, k3, bn1m, bn1a, bn2m, bn2a, bn3m, bn3a):
        bn = _pack_bn((bn1m, bn1a), (bn2m, bn2a), (bn3m, bn3a), x.shape[-1])
        return _impl(x, k1, k2, k3, bn, interpret=interpret)

    def fwd(x, k1, k2, k3, *bns):
        return fused(x, k1, k2, k3, *bns), (x, k1, k2, k3, bns)

    fused.defvjp(fwd, _fused_bwd)
    return fused


_fused = _make_fused(interpret=False)
_fused_interp = _make_fused(interpret=True)


def fused_dense_block(x, k1, k2, k3, bn1, bn2, bn3, interpret: bool = False):
    """Whole DenseConvBlock (in == out features) in one Pallas kernel.

    ``bn{i}`` are (mul, add) folded FrozenBatchNorm pairs in the channel
    counts of each stage's input.  Callers gate on
    ``dense_block_eligible``.
    """
    f = _fused_interp if interpret else _fused
    return f(x, k1, k2, k3, bn1[0], bn1[1], bn2[0], bn2[1], bn3[0], bn3[1])
