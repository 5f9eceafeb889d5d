"""On-chip check + timing of the fused Pallas DenseConvBlock vs the
unfused op chain, at the real FAN hourglass shapes.

Chained-in-jit timing with a scalar sync (tunnel backend), dispatch
floor amortized by K.  Usage: python scripts/bench_denseblock.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ppvision_tpu.ops.denseblock import dense_block_ref, fused_dense_block

SHAPES = [
    (128, 64, 64, 256),
    (128, 32, 32, 256),
    (128, 16, 16, 256),
    (128, 8, 8, 256),
    (128, 64, 64, 128),
]
K = 8


def mk(key, b, h, w, f):
    ks = jax.random.split(key, 10)
    half, quarter = f // 2, f // 4
    x = jax.random.normal(ks[0], (b, h, w, f), jnp.bfloat16)
    k1 = jax.random.normal(ks[1], (3, 3, f, half), jnp.bfloat16) * 0.1
    k2 = jax.random.normal(ks[2], (3, 3, half, quarter), jnp.bfloat16) * 0.1
    k3 = jax.random.normal(ks[3], (3, 3, quarter, quarter), jnp.bfloat16) * 0.1
    bns = []
    for i, c in enumerate((f, half, quarter)):
        mul = 1.0 + 0.1 * jax.random.normal(ks[4 + i], (c,), jnp.float32)
        add = 0.1 * jax.random.normal(ks[7 + i], (c,), jnp.float32)
        bns.append((mul, add))
    return x, k1, k2, k3, bns


def chain(f, x, *args):
    """K chained applications inside one jit; returns scalar."""

    @jax.jit
    def run(x):
        def body(h, _):
            return f(h, *args), None

        h, _ = jax.lax.scan(body, x, None, length=K)
        return h[0, 0, 0, 0].astype(jnp.float32)

    float(run(x))  # compile
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        v = run(x)
    float(v)
    return (time.perf_counter() - t0) / (n * K)


def main():
    for b, h, w, f in SHAPES:
        x, k1, k2, k3, bns = mk(jax.random.key(0), b, h, w, f)

        fused = lambda x, *a: fused_dense_block(x, *a)
        ref = lambda x, *a: dense_block_ref(
            x, a[0], a[1], a[2], a[3], a[4], a[5]
        )
        # Equivalence on-chip.
        got = np.asarray(
            jax.jit(fused)(x, k1, k2, k3, *bns), np.float32
        )
        want = np.asarray(
            jax.jit(lambda x, *a: dense_block_ref(x, a[0], a[1], a[2], a[3:5], a[5:7], a[7:9]))(
                x, k1, k2, k3, *(v for bn in bns for v in bn)
            ),
            np.float32,
        )
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)

        tf = chain(fused, x, k1, k2, k3, *bns)
        tr = chain(
            lambda x, *a: dense_block_ref(x, a[0], a[1], a[2], a[3:5], a[5:7], a[7:9]),
            x, k1, k2, k3, *(v for bn in bns for v in bn),
        )
        print(
            f"{b}x{h}x{w}x{f}: rel={rel:.2e}  fused={tf*1e3:7.2f} ms  "
            f"unfused={tr*1e3:7.2f} ms  speedup={tr/tf:4.2f}x"
        )


if __name__ == "__main__":
    main()
