"""Roofline audit of RAFT optical flow (BASELINE config 5 compute core).

Decomposes the 134 pairs/s forward into stages with XLA cost_analysis
FLOPs/bytes and chained-dispatch timing (per-iter refine cost from an
iters sweep), so each stage gets an achieved-rate verdict against the
practical ceilings (166 TF/s bf16 MXU chain, 819 GB/s HBM — PERF.md).

Stages:
  fnet+cnet+corr : feature/context encoders + dense 4-level pyramid
                   (iters=0 variant: returns init flow)
  refine x N     : GRU update scan (per-iter = (t20 - t5) / 15)
  upsample       : convex upsample (inside every full run; tiny)

Usage: python scripts/audit_raft.py   (env: PPVISION_RAFT_BATCH)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.models.raft import RAFT

K = int(os.environ.get("PPVISION_BENCH_CHAIN", "8"))
PEAK_TF = 166e12
PEAK_GB = 819e9
DISPATCH_S = 7.5e-3 / K


def chain_time(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / K)
    return max(min(ts) - DISPATCH_S, 1e-9)


def cost(jfn, *args):
    c = jfn.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0.0), c.get("bytes accessed", 0.0)


def main():
    b = int(os.environ.get("PPVISION_RAFT_BATCH", "8"))
    size = 256
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    im1 = jax.random.uniform(k1, (b, size, size, 3)) * 255.0
    im2 = jax.random.uniform(k2, (b, size, size, 3)) * 255.0

    results = {}
    rows = []
    prev = None
    for iters in (1, 5, 20):
        model = RAFT(iters=iters)
        if iters == 1:
            params = model.init(k3, im1[:1], im2[:1])["params"]
        fn = jax.jit(
            lambda p, a, c, m=model: jnp.sum(
                m.apply({"params": p}, a, c)[-1].astype(jnp.float32)
            )
        )
        dt = chain_time(fn, params, im1, im2)
        fl, by = cost(fn, params, im1, im2)
        rows.append((iters, dt, fl, by))
        results[f"iters{iters}"] = dict(
            ms=round(dt * 1e3, 2), gflops=round(fl / 1e9, 1),
            gb=round(by / 1e9, 2),
            tf_s=round(fl / dt / 1e12, 1), gb_s=round(by / dt / 1e9, 0),
            pct_mxu=round(100 * fl / dt / PEAK_TF, 1),
            pct_hbm=round(100 * by / dt / PEAK_GB, 1),
        )

    (i1, t1, f1, b1), (i5, t5, f5, b5), (i20, t20, f20, b20) = rows
    per_iter = dict(
        ms=round((t20 - t5) / 15 * 1e3, 3),
        gflops=round((f20 - f5) / 15 / 1e9, 2),
        gb=round((b20 - b5) / 15 / 1e9, 3),
        tf_s=round((f20 - f5) / max(t20 - t5, 1e-9) / 1e12, 1),
        gb_s=round((b20 - b5) / max(t20 - t5, 1e-9) / 1e9, 0),
        pct_mxu=round(100 * (f20 - f5) / max(t20 - t5, 1e-9) / PEAK_TF, 1),
        pct_hbm=round(100 * (b20 - b5) / max(t20 - t5, 1e-9) / PEAK_GB, 1),
    )
    front = dict(  # encoders + pyramid + 1 refine + upsample
        ms=round(t1 * 1e3, 2), gflops=round(f1 / 1e9, 1),
        tf_s=round(f1 / t1 / 1e12, 1),
        pct_mxu=round(100 * f1 / t1 / PEAK_TF, 1),
        pct_hbm=round(100 * b1 / t1 / PEAK_GB, 1),
    )
    print(json.dumps(dict(stage="encoders+pyramid+1iter", **front)))
    print(json.dumps(dict(stage="per_refine_iter", **per_iter)))
    for k, v in results.items():
        print(json.dumps(dict(stage=k, **v)))
    print(json.dumps(dict(
        pairs_s_20=round(b / t20, 2), batch=b,
    )))


if __name__ == "__main__":
    main()
