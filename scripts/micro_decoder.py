"""Chain-synced micro timing of every decoder conv at bench shapes.

Times each conv of the 128^2 generator decode at R*B=1280 with K
chained dispatches + one trailing sync (removes the ~30 ms tunnel
round-trip per call). Prints achieved TF/s per conv.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.ops.fusedconv import conv3x3_avgpool2x, conv3x3_nearest_up2x

DN = ("NHWC", "HWIO", "NHWC")
RB = int(os.environ.get("PPVISION_MICRO_BATCH", "1280"))
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


def conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )


def main():
    jobs = [
        # (label, fn, h_in, ci, co, flops_per_img)
        ("bottleneck 8^2 512->512 x1", conv3x3, 8, 512, 512, 2 * 9 * 64 * 512 * 512),
        ("up 8->16 512->512", conv3x3_nearest_up2x, 8, 512, 512, 32 * 64 * 512 * 512),
        ("conv2 @16 512->512", conv3x3, 16, 512, 512, 2 * 9 * 256 * 512 * 512),
        ("up 16->32 512->512", conv3x3_nearest_up2x, 16, 512, 512, 32 * 256 * 512 * 512),
        ("conv2 @32 512->512", conv3x3, 32, 512, 512, 2 * 9 * 1024 * 512 * 512),
        ("up 32->64 512->256", conv3x3_nearest_up2x, 32, 512, 256, 32 * 1024 * 512 * 256),
        ("conv2 @64 256->256", conv3x3, 64, 256, 256, 2 * 9 * 4096 * 256 * 256),
        ("up 64->128 256->128", conv3x3_nearest_up2x, 64, 256, 128, 32 * 4096 * 256 * 128),
        ("conv2 @128 128->128", conv3x3, 128, 128, 128, 2 * 9 * 16384 * 128 * 128),
    ]
    total = 0.0
    for label, fn, h, ci, co, fpi in jobs:
        x = jax.random.normal(jax.random.key(0), (RB, h, h, ci), jnp.bfloat16)
        kk = jax.random.normal(jax.random.key(1), (3, 3, ci, co), jnp.float32)
        ms = timeit(fn, x, kk)
        total += ms
        tf = RB * fpi / ms / 1e9
        print(f"{label:28s} {ms:7.2f} ms  {tf:6.1f} TF/s  ({tf / 197 * 100:4.1f}% MFU)")
    print(f"decoder conv total: {total:.1f} ms for {RB} outputs")


if __name__ == "__main__":
    main()
