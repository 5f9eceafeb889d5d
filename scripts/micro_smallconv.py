"""Formulation shoot-out for 3x3 convs at tiny spatial dims (8^2/16^2).

(a) lax.conv NHWC  (b) explicit im2col + one GEMM  (c) 9-shift dot-accum.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")
RB = 1280
K = 4


def timeit(f, *args):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(g(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = g(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / K)
    return min(ts) * 1e3


def conv_lax(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )


def conv_im2col(x, k):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, i : i + h, j : j + w] for i in range(3) for j in range(3)]
    z = jnp.concatenate(cols, axis=-1)  # (B,H,W,9C)
    km = k.astype(x.dtype).reshape(9 * c, -1)
    return jnp.einsum("bhwc,cd->bhwd", z, km)


def conv_shiftacc(x, k):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kb = k.astype(x.dtype)
    out = None
    for i in range(3):
        for j in range(3):
            t = jnp.einsum("bhwc,cd->bhwd", xp[:, i : i + h, j : j + w], kb[i, j])
            out = t if out is None else out + t
    return out


def main():
    for h, c in [(8, 512), (16, 512)]:
        x = jax.random.normal(jax.random.key(0), (RB, h, h, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (3, 3, c, c), jnp.float32)
        fl = RB * 2 * 9 * h * h * c * c
        # correctness
        w_ = np.asarray(conv_lax(x, k), np.float32)
        for name, fn in [("im2col", conv_im2col), ("shiftacc", conv_shiftacc)]:
            g_ = np.asarray(fn(x, k), np.float32)
            err = np.max(np.abs(g_ - w_)) / (np.abs(w_).max() + 1e-6)
            assert err < 0.05, (name, err)
        a = timeit(conv_lax, x, k)
        b_ = timeit(conv_im2col, x, k)
        cc = timeit(conv_shiftacc, x, k)
        print(
            f"{h}^2x{c}: lax {a:.2f}ms ({fl/a/1e9:.0f} TF/s) | im2col {b_:.2f}ms "
            f"({fl/b_/1e9:.0f} TF/s) | shiftacc {cc:.2f}ms ({fl/cc/1e9:.0f} TF/s)"
        )


if __name__ == "__main__":
    main()
