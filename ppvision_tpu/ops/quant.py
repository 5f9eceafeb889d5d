"""Int8 post-training-quantized convolutions (opt-in serving mode).

Premise and status: TPU v5e's datasheet rates s8 x s8 -> s32 at ~2.4x
the bf16 FLOP rate, which for the FLOP-bound de-id decoder (97% of the
practical bf16 conv peak — PERF.md round-2e) would be the only lever
left above the bf16 roofline.  MEASURED on this chip/backend the rate
does not materialize: s8 convs and dots lower natively but execute at
the bf16 rate (1.01x on a pure GEMM — PERF.md round-4a), so this mode
is PARKED as a no-win on current hardware; it ships opt-in, correct,
and quality-gated for backends that do expose the s8 rate.  The
recipe is the standard dynamic quantization:

- **weights**: symmetric per-output-channel int8, derived at trace time
  from the f32 master parameters (the param tree is unchanged — this is
  a compute variant, not a different checkpoint format);
- **activations**: symmetric per-tensor int8 with a dynamic abs-max
  scale, so no calibration pass or data is needed;
- **accumulation**: int32 on the MXU, rescaled to the compute dtype.

This is NOT exact math (unlike every transform on the default path —
see ops/fusedconv.py); it ships strictly opt-in
(``ModelConfig.quant_decode``) and the bench reports it as a separate
labeled number.  Quality bounds are tested in tests/test_quant.py.

No reference counterpart: the reference (carlosh93/privacy-preserving-
vision) serves f32 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight_per_oc",
    "quantize_dynamic",
    "int8_conv",
    "int8_conv3x3_nearest_up2x",
]

_DN = ("NHWC", "HWIO", "NHWC")


def quantize_weight_per_oc(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns ``(kernel_q int8, scale f32[O])`` with
    ``kernel ~= kernel_q * scale``.
    """
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return kq.astype(jnp.int8), scale


def quantize_dynamic(x: jnp.ndarray, per_sample: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric dynamic int8 quantization of an NHWC activation batch.

    ``per_sample=True`` (default) computes one abs-max scale per batch
    element — batch images are independent at serving time, so sharing
    one scale across the batch would let one outlier image coarsen
    everyone's grid for no FLOP saving.  Returns ``(x_q int8, scale)``
    with ``x ~= x_q * scale``; scale is (B,1,1,1) f32 (scalar when
    ``per_sample=False``).
    """
    xf = x.astype(jnp.float32)
    if per_sample:
        amax = jnp.max(jnp.abs(xf), axis=tuple(range(1, x.ndim)), keepdims=True)
    else:
        amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def _rescale(y32: jnp.ndarray, sx: jnp.ndarray, sk: jnp.ndarray, dtype) -> jnp.ndarray:
    return (y32.astype(jnp.float32) * (sx * sk)).astype(dtype)


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """``conv(x, kernel)`` computed in int8 on the MXU.

    ``x`` (B,H,W,I) in the compute dtype; ``kernel`` (kh,kw,I,O) f32
    master.  Output is in ``x.dtype``; no bias.
    """
    xq, sx = quantize_dynamic(x)
    kq, sk = quantize_weight_per_oc(kernel)
    y = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    return _rescale(y, sx, sk, x.dtype)


def int8_conv3x3_nearest_up2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Int8 variant of ``ops.fusedconv.conv3x3_nearest_up2x``.

    The fused 4x4 transposed-conv kernel (the exact nearest-up2x ∘
    conv3x3 composition — see fusedconv.py for the derivation) is built
    in f32 and THEN quantized, so the only approximation is the int8
    rounding itself, applied once.
    """
    k = kernel.astype(jnp.float32)
    kr = jnp.stack([k[0], k[0] + k[1], k[1] + k[2], k[2]], 0)
    k4 = jnp.stack(
        [kr[:, 0], kr[:, 0] + kr[:, 1], kr[:, 1] + kr[:, 2], kr[:, 2]], 1
    )  # (4,4,I,O)
    xq, sx = quantize_dynamic(x)
    kq, sk = quantize_weight_per_oc(k4)
    # conv_transpose(x, K4, stride 2, pad 2) == nearest_up2x -> conv3x3.
    y = jax.lax.conv_transpose(
        xq, kq, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    return _rescale(y, sx, sk, x.dtype)
