"""Float64 convolution as tap-sum matmuls (CPU verification path).

XLA-CPU lowers f32 convolutions to Eigen's fast packed kernels but f64
convolutions to naive scalar loop nests — measured 33x slower at
framework shapes, which makes the f64 free-running dynamics goldens
(tests/test_train_free_running_f64.py) intractable.  An s-strided
k x k convolution is exactly the sum over its k^2 taps of a strided
slice times a (Cin, Cout) matrix, and f64 GEMMs DO ride Eigen (dgemm),
so :func:`conv2d` dispatches f64 inputs to the tap-sum form and
everything else to ``lax.conv_general_dilated`` unchanged.

Numerics: each tap product accumulates in f64 exactly as the direct
convolution would; only the summation ORDER over taps differs (a
~1e-16 relative reassociation, far below the goldens' tolerances).

NHWC / HWIO / NHWC only (the framework's fixed layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d"]


def _pads(x, kh, kw, strides, padding):
    if isinstance(padding, str):
        if padding == "VALID":
            return ((0, 0), (0, 0))
        return tuple(
            lax.padtype_to_pads(x.shape[1:3], (kh, kw), strides, padding)
        )
    return tuple(tuple(p) for p in padding)


def conv2d(
    x: jnp.ndarray,
    k: jnp.ndarray,
    strides=(1, 1),
    padding="SAME",
    feature_group_count: int = 1,
    preferred_element_type=None,
) -> jnp.ndarray:
    """``lax.conv_general_dilated`` (NHWC/HWIO/NHWC), f64 via matmuls."""
    if strides is None:
        strides = (1, 1)
    elif isinstance(strides, int):
        strides = (strides, strides)
    else:
        strides = tuple(strides)
    if x.dtype != jnp.float64:
        return lax.conv_general_dilated(
            x, k, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
            preferred_element_type=preferred_element_type,
        )
    kh, kw, cin_g, cout = k.shape
    sh, sw = strides
    (pt, pb), (pl, pr) = _pads(x, kh, kw, strides, padding)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    k = k.astype(jnp.float64)
    out = None
    depthwise = feature_group_count > 1
    if depthwise:
        # Depthwise only (the highpass filter): groups == Cin, Cin/g == 1.
        assert cin_g == 1 and feature_group_count == x.shape[-1] == cout, (
            "only depthwise grouping supported in the f64 path"
        )
    for dy in range(kh):
        for dx in range(kw):
            xs = lax.slice(
                xp,
                (0, dy, dx, 0),
                (xp.shape[0], dy + sh * (oh - 1) + 1, dx + sw * (ow - 1) + 1,
                 xp.shape[3]),
                (1, sh, sw, 1),
            )
            t = (
                xs * k[dy, dx, 0][None, None, None, :]
                if depthwise
                else jnp.einsum("bhwc,co->bhwo", xs, k[dy, dx])
            )
            out = t if out is None else out + t
    return out
