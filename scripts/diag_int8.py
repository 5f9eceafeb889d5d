"""Diagnose the int8-decode throughput inversion (VERDICT r4 item 2).

BENCH_r03: int8_img_s 5,009.5 < bf16 headline 5,231.5, against the
~2.4x s8 MXU premise (ops/quant.py:3-7).  This script isolates, on the
real chip, at the decoder's actual shapes:

  A. pure conv rate: bf16 conv vs pre-quantized s8xs8->s32 conv
     (is the 2.4x MXU rate reachable through XLA at all?)
  B. the same for the 4x4/s2 conv_transpose (the up-blocks)
  C. the full dynamic recipe (quantize + conv + rescale) vs bf16
     (how much do the absmax/round/rescale passes cost?)
  D. HLO: do the s8 convolutions survive lowering, or does XLA
     convert-upcast them?

Run on the tunnel backend (no JAX_PLATFORMS override).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DN = ("NHWC", "HWIO", "NHWC")
K = int(os.environ.get("CHAIN", "8"))


def timeit(fn, *args) -> float:
    """Min-of-6 of a K-chained jitted call, seconds per call."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / K)
    return min(times)


def conv_bf16(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=_DN)


def conv_s8(xq, kq):
    return jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def convt_bf16(x, k):
    return jax.lax.conv_transpose(x, k, (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN)


def convt_s8(xq, kq):
    return jax.lax.conv_transpose(
        xq, kq, (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def hlo_conv_ops(fn, *args) -> list:
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = []
    for line in txt.splitlines():
        if "convolution" in line and "=" in line:
            ops.append(line.strip().split(" = ")[1][:120])
    return ops


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    results = {}

    # Decode bottleneck shapes (PERF.md round-2c budget: AdainResBlk 3/4/5).
    shapes = [
        ("32x32x512->512 3x3", (128, 32, 32, 512), (3, 3, 512, 512)),
        ("64x64x256->256 3x3", (128, 64, 64, 256), (3, 3, 256, 256)),
        ("128x128x128->128 3x3", (128, 128, 128, 128), (3, 3, 128, 128)),
    ]
    for name, xs, ks in shapes:
        x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), ks, jnp.bfloat16)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
        kq = jnp.clip(jnp.round(k.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

        # chain through a cheap sum to serialize without huge outputs
        f_bf = jax.jit(lambda x, k: jnp.sum(conv_bf16(x, k), dtype=jnp.float32))
        f_s8 = jax.jit(lambda x, k: jnp.sum(conv_s8(x, k)))
        t_bf = timeit(f_bf, x, k)
        t_s8 = timeit(f_s8, xq, kq)
        flops = 2 * np.prod(xs) * ks[0] * ks[1] * ks[3]
        results[name] = {
            "bf16_ms": round(t_bf * 1e3, 2),
            "s8_ms": round(t_s8 * 1e3, 2),
            "s8_speedup": round(t_bf / t_s8, 2),
            "bf16_TFs": round(flops / t_bf / 1e12, 1),
            "s8_TOPs": round(flops / t_s8 / 1e12, 1),
        }
        print(name, results[name])

    # conv_transpose up-block shape
    name = "16x16x512 convT 4x4/s2"
    xs, ks = (128, 16, 16, 512), (4, 4, 512, 512)
    x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), ks, jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    f_bf = jax.jit(lambda x, k: jnp.sum(convt_bf16(x, k), dtype=jnp.float32))
    f_s8 = jax.jit(lambda x, k: jnp.sum(convt_s8(x, k)))
    t_bf, t_s8 = timeit(f_bf, x, k), timeit(f_s8, xq, kq)
    results[name] = {
        "bf16_ms": round(t_bf * 1e3, 2), "s8_ms": round(t_s8 * 1e3, 2),
        "s8_speedup": round(t_bf / t_s8, 2),
    }
    print(name, results[name])

    # C: full dynamic recipe at the biggest shape
    from ppvision_tpu.ops.quant import int8_conv
    xs, ks = (128, 64, 64, 256), (3, 3, 256, 256)
    x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
    kf = jax.random.normal(jax.random.key(1), ks, jnp.float32)
    f_dyn = jax.jit(lambda x, k: jnp.sum(int8_conv(x, k), dtype=jnp.float32))
    t_dyn = timeit(f_dyn, x, kf)
    results["full_dynamic_recipe 64x64x256"] = {
        "dyn_ms": round(t_dyn * 1e3, 2),
        "vs_bf16": round(results["64x64x256->256 3x3"]["bf16_ms"] / (t_dyn * 1e3), 2),
    }
    print("full_dynamic_recipe", results["full_dynamic_recipe 64x64x256"])

    # D: HLO inspection
    x_small = x[:8]
    xq_small = jnp.clip(jnp.round(x_small.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(kf * 10), -127, 127).astype(jnp.int8)
    print("\nHLO s8 conv:", *hlo_conv_ops(conv_s8, xq_small, kq), sep="\n  ")
    print("\nHLO s8 convT:", *hlo_conv_ops(
        convt_s8, xq_small[:, :16, :16, :],
        jnp.zeros((4, 4, 256, 256), jnp.int8)), sep="\n  ")
    print("\nHLO dyn recipe:", *hlo_conv_ops(lambda x, k: int8_conv(x, k), x_small, kf), sep="\n  ")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
