"""On-chip validation + throughput for the opt-in int8 decode mode.

Runs the same amortized de-id eval workload as bench.py twice — exact
bf16 decode and int8 decode (ModelConfig.quant_decode) — over the SAME
parameters, checks the int8 output against the exact output (finite +
close), and prints one JSON line with both throughputs.

Usage: python scripts/bench_int8.py   [env: PPVISION_BENCH_SRC, _OUTS,
_CHAIN as bench.py]
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_multi_style

    b = int(os.environ.get("PPVISION_BENCH_SRC", "256"))
    r = int(os.environ.get("PPVISION_BENCH_OUTS", "10"))
    k = int(os.environ.get("PPVISION_BENCH_CHAIN", "8"))

    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, quant_decode=True))
    qbundle = build_deid(jax.random.key(0), qcfg)._replace(params=bundle.params)

    x_src = jax.random.uniform(jax.random.key(1), (b, 128, 128, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (r, 128, 128, 3))
    y_ref = jnp.zeros((r,), dtype=jnp.int32)

    def run(bn):
        return deid_multi_style(bn, bn.params, x_src, x_ref, y_ref)

    # Correctness gate at a small batch first (cheap compile, and a
    # failed int8 lowering poisons the process — fail loudly here).
    small = (x_src[:4], x_ref, y_ref)
    ye = jax.jit(lambda xs, xr, yr: deid_multi_style(bundle, bundle.params, xs, xr, yr))(*small)
    yq = jax.jit(lambda xs, xr, yr: deid_multi_style(qbundle, qbundle.params, xs, xr, yr))(*small)
    import numpy as np

    ye_h, yq_h = np.asarray(ye), np.asarray(yq)
    assert np.isfinite(yq_h).all(), "int8 output non-finite"
    rel = float(np.linalg.norm(yq_h - ye_h) / np.linalg.norm(ye_h))
    psnr = float(10 * np.log10(4.0 / np.mean((yq_h - ye_h) ** 2)))
    assert rel < 0.25, f"int8 output diverged: rel={rel}"

    def chain_time(bn) -> float:
        fn = jax.jit(
            lambda p, xs, xr, yr: deid_multi_style(bn, p, xs, xr, yr)[0, 0, 0, 0, 0]
        )
        float(fn(bn.params, x_src, x_ref, y_ref))  # compile + warm
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(bn.params, x_src, x_ref, y_ref)
            float(out)
            times.append((time.perf_counter() - t0) / k)
        return min(times)

    exact_img_s = (b * r) / chain_time(bundle)
    int8_img_s = (b * r) / chain_time(qbundle)
    print(
        json.dumps(
            {
                "metric": "de-id img/s, int8 decode vs exact bf16",
                "exact_img_s": round(exact_img_s, 1),
                "int8_img_s": round(int8_img_s, 1),
                "speedup": round(int8_img_s / exact_img_s, 3),
                "int8_rel_err": round(rel, 4),
                "int8_psnr_db": round(psnr, 1),
                "batch": b,
                "styles": r,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
