"""RAFT optical-flow throughput (BASELINE.json config 5 compute core).

Times the full RAFT forward (fnet/cnet + 4-level corr pyramid + N GRU
refinement iters + convex upsample) at the reference's video de-id
setting (iters=20, test-mode; Face-DeId/core/utils.py:460-462) on
256^2 frame pairs. Chained-dispatch timing (see bench.py).

Prints one JSON line. Env: PPVISION_RAFT_BATCH (default 8),
PPVISION_RAFT_ITERS (default 20), PPVISION_RAFT_SIZE (default 256),
PPVISION_RAFT_ALTERNATE=1 (on-demand ops.corr lookup instead of the
dense pyramid — the reference --alternate_corr mode).
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


def main():
    b = int(os.environ.get("PPVISION_RAFT_BATCH", "8"))
    iters = int(os.environ.get("PPVISION_RAFT_ITERS", "20"))
    size = int(os.environ.get("PPVISION_RAFT_SIZE", "256"))

    alternate = os.environ.get("PPVISION_RAFT_ALTERNATE", "0") == "1"
    model = RAFT(iters=iters, alternate_corr=alternate)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    im1 = jax.random.uniform(k1, (b, size, size, 3)) * 255.0
    im2 = jax.random.uniform(k2, (b, size, size, 3)) * 255.0
    params = model.init(k3, im1[:1], im2[:1])["params"]

    fn = jax.jit(
        lambda p, a, c: jnp.sum(
            model.apply({"params": p}, a, c)[-1].astype(jnp.float32)
        )
    )
    warm = float(fn(params, im1, im2))
    assert warm == warm, "non-finite flow"

    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fn(params, im1, im2)
        float(out)
        ts.append((time.perf_counter() - t0) / K)
    dt = min(ts)
    print(json.dumps({
        "metric": f"RAFT flow pairs/s/chip ({size}^2, {iters} iters"
        + (", alternate_corr)" if alternate else ")"),
        "value": round(b / dt, 2), "unit": "pairs/s", "sec_per_iter": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
