"""Micro-bench: formulations of nearest2x->conv3x3 at bench-dominant shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.ops.fusedconv import conv3x3_nearest_up2x
from ppvision_tpu.ops.image import upsample_nearest_2x

DN = ("NHWC", "HWIO", "NHWC")


def naive(x, k):
    return jax.lax.conv_general_dilated(
        upsample_nearest_2x(x), k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )


def fused(x, k):
    return conv3x3_nearest_up2x(x, k)


def transposed(x, k):
    # nearest-up + conv3x3 == 4x4/s2 input-dilated conv with kernel
    # K4[u] built by interleaving the phase kernels (rows: K2, K1+K2,
    # K0+K1, K0 after the lhs-dilation flip). Built numerically below by
    # embedding: lax.conv_transpose(x, k4, (2,2), pad) — verify offline.
    k4r = jnp.stack([k[0], k[0] + k[1], k[1] + k[2], k[2]], 0)  # (4,3,I,O)
    k4 = jnp.stack(
        [k4r[:, 0], k4r[:, 0] + k4r[:, 1], k4r[:, 1] + k4r[:, 2], k4r[:, 2]], 1
    )
    return jax.lax.conv_transpose(
        x, k4.astype(x.dtype), (2, 2), ((2, 2), (2, 2)), dimension_numbers=DN
    )


def timeit(f, *args):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(g(*args))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    for (b, h, ci, co) in [(320, 64, 256, 128), (640, 32, 512, 256), (1280, 16, 512, 512)]:
        x = jax.random.normal(jax.random.key(0), (b, h, h, ci), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (3, 3, ci, co), jnp.float32)
        kb = k.astype(jnp.bfloat16)
        flops = 4 * 2 * 9 * b * h * h * ci * co
        n = timeit(naive, x, kb)
        f = timeit(fused, x, k)
        t = timeit(transposed, x, k)
        # correctness of transposed vs naive (loose, bf16)
        err = float(
            jnp.max(jnp.abs(transposed(x, k).astype(jnp.float32) - naive(x, kb).astype(jnp.float32)))
        )
        print(
            f"B{b} {h}->{2*h} {ci}->{co}: naive {n:.1f}ms ({flops/n/1e9:.0f} TF/s) "
            f"fused {f:.1f}ms transposed {t:.1f}ms (err {err:.3f}, naive-vs-fused only)"
        )


if __name__ == "__main__":
    main()
