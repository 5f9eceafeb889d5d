"""Pallas corr kernel: compiled-on-TPU proof + timing (VERDICT r3 #5).

Compiles ``ops.corr.local_corr_pallas`` on the REAL TPU backend at RAFT
shapes (the reference alt_cuda_corr workload,
Face-DeId/RAFT/alt_cuda_corr/correlation_kernel.cu:19-119), asserts
numerical equivalence with ``local_corr_xla`` on-chip, and times three
formulations of the per-iteration corr lookup:

  1. pallas   — the Pallas window kernel (one level);
  2. xla      — the gather-based XLA window lookup (one level);
  3. dense    — the dense hat-function pyramid lookup the production
                RAFT uses (all levels; amortized per level).

Chained-dispatch timing as in bench.py (the tunnel's ~7.5 ms/program
floor is reported separately, not subtracted).  Prints ONE JSON line;
paste into PERF.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("PPVISION_BENCH_CHAIN", "8"))


def chain_time(fn, *args) -> float:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fn(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / K)
    return min(ts)


def main():
    from ppvision_tpu.models.raft import build_corr_pyramid, lookup_corr_pyramid
    from ppvision_tpu.ops.corr import local_corr_pallas, local_corr_xla

    b = int(os.environ.get("PPVISION_CORR_BATCH", "8"))
    hw = int(os.environ.get("PPVISION_CORR_HW", "32"))  # 256^2 frames / 8
    c, r, levels = 256, 4, 4

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    fmap1 = jax.random.normal(k1, (b, hw, hw, c), jnp.float32)
    fmap2 = jax.random.normal(k2, (b, hw, hw, c), jnp.float32)
    coords = jax.random.uniform(k3, (b, hw, hw, 2), jnp.float32) * (hw - 1)

    backend = jax.default_backend()
    out = {"backend": backend, "shape": f"B{b} {hw}x{hw} C{c} r{r}"}

    # --- compiled equivalence on this backend -----------------------
    pallas_fn = jax.jit(lambda a, bb, cc: local_corr_pallas(a, bb, cc, r))
    xla_fn = jax.jit(lambda a, bb, cc: local_corr_xla(a, bb, cc, r))
    got = np.asarray(pallas_fn(fmap1, fmap2, coords))
    want = np.asarray(xla_fn(fmap1, fmap2, coords))
    scale = np.abs(want).max() + 1e-9
    max_rel = float(np.abs(got - want).max() / scale)
    out["pallas_vs_xla_max_rel_err"] = round(max_rel, 8)
    assert max_rel < 1e-4, f"Pallas corr mismatch on {backend}: {max_rel}"

    # --- timing (sync scalar per call; ~7.5 ms/program tunnel floor) --
    pallas_t = jax.jit(lambda a, bb, cc: jnp.sum(local_corr_pallas(a, bb, cc, r)))
    xla_t = jax.jit(lambda a, bb, cc: jnp.sum(local_corr_xla(a, bb, cc, r)))

    def dense(a, bb, cc):
        pyr = build_corr_pyramid(a, bb, levels)
        return jnp.sum(lookup_corr_pyramid(pyr, cc, r))

    dense_t = jax.jit(dense)
    for f in (pallas_t, xla_t, dense_t):
        float(f(fmap1, fmap2, coords))  # compile + warm
    out["pallas_ms"] = round(chain_time(pallas_t, fmap1, fmap2, coords) * 1e3, 3)
    out["xla_window_ms"] = round(chain_time(xla_t, fmap1, fmap2, coords) * 1e3, 3)
    out["dense_pyramid_all_levels_ms"] = round(
        chain_time(dense_t, fmap1, fmap2, coords) * 1e3, 3
    )
    out["dispatch_floor_ms"] = 7.5
    print(json.dumps(out))


if __name__ == "__main__":
    main()
