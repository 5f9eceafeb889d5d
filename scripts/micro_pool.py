"""Micro-bench exact 2x2/stride-2 mean-pool formulations at FAN shapes.

The 6D-view slice form (ops/image.py::avg_pool_2x) costs a full layout
copy at bench shapes (~1.6 ms for [128,128,128,128] bf16, trace round
r2e). Candidates must be EXACT (power-of-2 scaling commutes with FP
rounding; only the add association may differ).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ppvision_tpu.ops.image import avg_pool_2x

B, H, W, C = 128, 128, 128, 128
K = 8


def pool_slices(x):
    return avg_pool_2x(x)


def pool_reduce_window(x):
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return (s * 0.25).astype(x.dtype)


def pool_depthwise(x):
    c = x.shape[-1]
    k = jnp.full((2, 2, 1, c), 0.25, jnp.float32)
    return lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def pool_diag_conv(x):
    c = x.shape[-1]
    k = jnp.zeros((2, 2, c, c), jnp.float32).at[:, :, jnp.arange(c), jnp.arange(c)].set(0.25)
    return lax.conv_general_dilated(
        x,
        k.astype(jnp.bfloat16) if x.dtype == jnp.bfloat16 else k,
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def pool_strided4d(x):
    s = (
        x[:, 0::2, 0::2].astype(jnp.float32)
        + x[:, 1::2, 0::2]
        + x[:, 0::2, 1::2]
        + x[:, 1::2, 1::2]
    )
    return (s * 0.25).astype(x.dtype)


def main():
    x = jax.random.uniform(jax.random.key(0), (B, H, W, C)).astype(jnp.bfloat16)
    ref = np.asarray(pool_slices(x).astype(jnp.float32))
    for name, fn in [
        ("slices6d", pool_slices),
        ("reduce_window", pool_reduce_window),
        ("depthwise", pool_depthwise),
        ("diag_conv", pool_diag_conv),
        ("strided4d", pool_strided4d),
    ]:
        # chain K through a tiny perturbation to defeat CSE
        def chain(x0):
            acc = jnp.float32(0)
            y = x0
            for i in range(K):
                p = fn(y + jnp.bfloat16(i * 2**-14))
                acc = acc + jnp.sum(p[0, 0, :4].astype(jnp.float32))
            return acc

        j = jax.jit(chain)
        float(j(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(j(x))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.0075) / K * 1e3
        got = np.asarray(fn(x).astype(jnp.float32))
        exact = np.array_equal(ref, got)
        print(f"{name:14s} {t:7.3f} ms/pool  bitexact_vs_slices={exact}")


if __name__ == "__main__":
    main()
