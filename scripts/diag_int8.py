"""Diagnose the int8-decode throughput inversion (VERDICT r4 item 2).

BENCH_r03: int8_img_s 5,009.5 < bf16 headline 5,231.5, against the
~2.4x s8 MXU premise (ops/quant.py:3-7).  This script isolates, on the
real chip, at the decoder's actual shapes:

  A. pure conv rate: bf16 conv vs pre-quantized s8xs8->s32 conv
     (is the 2.4x MXU rate reachable through XLA at all?)
  B. the same for the 4x4/s2 conv_transpose (the up-blocks)
  C. the full dynamic recipe (quantize + conv + rescale) and a
     static-scale variant (no absmax pass) vs bf16
  D. HLO: do the s8 convolutions survive lowering, or does XLA
     convert-upcast them?

Timing: K independent convs (distinct kernels -> no CSE) inside ONE
jit, synced by a scalar host transfer; the ~7.5 ms dispatch floor is
subtracted once per program (verify-skill methodology).

Run on the tunnel backend (no JAX_PLATFORMS override).
"""

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
FLOOR = 7.5e-3


def timeit_synced(fn, *args, reps=6):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - FLOOR) / K


def conv_s8(xq, kq, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        xq, kq, strides, "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def hlo_conv_ops(fn, *args) -> list:
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = []
    for line in txt.splitlines():
        if "convolution" in line and "=" in line:
            ops.append(line.strip().split(" = ")[1][:120])
    return ops


def _bank(key, shape, n):
    """n distinct bf16 kernels + their s8 quantizations."""
    ks = jax.random.normal(key, (n,) + shape, jnp.bfloat16)
    kq = jnp.clip(jnp.round(ks.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    return ks, kq


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()} chain={K}")
    results = {}

    shapes = [
        ("32x32x512->512 3x3", (128, 32, 32, 512), (3, 3, 512, 512)),
        ("64x64x256->256 3x3", (128, 64, 64, 256), (3, 3, 256, 256)),
        ("128x128x128->128 3x3", (128, 128, 128, 128), (3, 3, 128, 128)),
    ]
    for name, xs, ks in shapes:
        x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
        kb, kqb = _bank(jax.random.key(1), ks, K)

        @jax.jit
        def f_bf(x, kb):
            tot = jnp.float32(0)
            for i in range(K):
                tot += jnp.sum(
                    jax.lax.conv_general_dilated(
                        x, kb[i], (1, 1), "SAME", dimension_numbers=_DN
                    ),
                    dtype=jnp.float32,
                )
            return tot

        @jax.jit
        def f_s8(xq, kqb):
            tot = jnp.int32(0)
            for i in range(K):
                tot += jnp.sum(conv_s8(xq, kqb[i]))
            return tot

        t_bf = timeit_synced(f_bf, x, kb)
        t_s8 = timeit_synced(f_s8, xq, kqb)
        flops = 2 * np.prod(xs) * ks[0] * ks[1] * ks[3]
        results[name] = {
            "bf16_ms": round(t_bf * 1e3, 2),
            "s8_ms": round(t_s8 * 1e3, 2),
            "s8_speedup": round(t_bf / t_s8, 2),
            "bf16_TFs": round(flops / t_bf / 1e12, 1),
            "s8_TOPs": round(flops / t_s8 / 1e12, 1),
        }
        print(name, results[name])

    # B: conv_transpose up-block shape (lowered as lhs-dilated conv)
    name = "16x16x512 convT 4x4/s2"
    xs, ks = (128, 16, 16, 512), (4, 4, 512, 512)
    x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    kb, kqb = _bank(jax.random.key(1), ks, K)

    @jax.jit
    def ft_bf(x, kb):
        tot = jnp.float32(0)
        for i in range(K):
            tot += jnp.sum(
                jax.lax.conv_transpose(
                    x, kb[i], (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN
                ),
                dtype=jnp.float32,
            )
        return tot

    @jax.jit
    def ft_s8(xq, kqb):
        tot = jnp.int32(0)
        for i in range(K):
            tot += jnp.sum(
                jax.lax.conv_transpose(
                    xq, kqb[i], (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN,
                    preferred_element_type=jnp.int32,
                )
            )
        return tot

    t_bf, t_s8 = timeit_synced(ft_bf, x, kb), timeit_synced(ft_s8, xq, kqb)
    results[name] = {
        "bf16_ms": round(t_bf * 1e3, 2), "s8_ms": round(t_s8 * 1e3, 2),
        "s8_speedup": round(t_bf / t_s8, 2),
    }
    print(name, results[name])

    # C: full dynamic recipe (absmax + quantize + conv + rescale) and a
    # static-scale variant, at the biggest decode shape.
    from ppvision_tpu.ops.quant import int8_conv, quantize_weight_per_oc

    xs, ks = (128, 64, 64, 256), (3, 3, 256, 256)
    x = jax.random.normal(jax.random.key(0), xs, jnp.bfloat16)
    kf = jax.random.normal(jax.random.key(1), (K,) + ks, jnp.float32)

    @jax.jit
    def f_dyn(x, kf):
        tot = jnp.float32(0)
        for i in range(K):
            tot += jnp.sum(int8_conv(x, kf[i]), dtype=jnp.float32)
        return tot

    t_dyn = timeit_synced(f_dyn, x, kf)

    kq_static = [quantize_weight_per_oc(kf[i]) for i in range(K)]
    kqs = jnp.stack([kq for kq, _ in kq_static])
    sks = jnp.stack([sk for _, sk in kq_static])

    @jax.jit
    def f_static(xq, kqs, sks):
        # activations pre-quantized once with a static scale: isolates
        # the conv + rescale cost without the per-call absmax pass.
        tot = jnp.float32(0)
        for i in range(K):
            y = conv_s8(xq, kqs[i])
            tot += jnp.sum(y.astype(jnp.float32) * sks[i], dtype=jnp.float32)
        return tot

    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 4.0), -127, 127).astype(jnp.int8)
    t_static = timeit_synced(f_static, xq, kqs, sks)
    base = results["64x64x256->256 3x3"]["bf16_ms"]
    results["recipe 64x64x256"] = {
        "dyn_ms": round(t_dyn * 1e3, 2),
        "static_ms": round(t_static * 1e3, 2),
        "dyn_vs_bf16": round(base / (t_dyn * 1e3), 2),
        "static_vs_bf16": round(base / (t_static * 1e3), 2),
    }
    print("recipe", results["recipe 64x64x256"])

    # D: HLO inspection
    x_small = x[:8]
    xq_small = xq[:8]
    kq = kqs[0]
    print("\nHLO s8 conv:", *hlo_conv_ops(conv_s8, xq_small, kq), sep="\n  ")
    print("\nHLO dyn recipe:", *hlo_conv_ops(
        lambda x, k: int8_conv(x, k), x_small, kf[0]), sep="\n  ")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
