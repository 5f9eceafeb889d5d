"""Throughput benchmark: de-id images/sec/chip (camera + FAN + generator).

Measures the BASELINE.json north-star path — 128x128 privacy-preserved
de-identification (Camera optical encoder -> fan_priv heatmaps ->
StarGAN-v2 generator with reference styles) — on the current default
JAX backend, and prints ONE JSON line.

Baseline: >=5000 img/s/chip (BASELINE.json).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 5000.0


def main() -> None:
    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_from_reference

    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)

    batch = int(__import__("os").environ.get("PPVISION_BENCH_BATCH", "256"))
    x_src = jax.random.uniform(jax.random.key(1), (batch, 128, 128, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (batch, 128, 128, 3))
    y_ref = jnp.zeros((batch,), dtype=jnp.int32)

    # The tunnel backend's block_until_ready does not synchronize with
    # device completion, and chained async dispatches time unreliably;
    # force a scalar host transfer on EVERY timed call and take the
    # minimum (steady-state) iteration.
    fn = jax.jit(
        lambda p, xs, xr, yr: jnp.sum(deid_from_reference(bundle, p, xs, xr, yr))
    )
    float(fn(bundle.params, x_src, x_ref, y_ref))  # compile + warm up

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(fn(bundle.params, x_src, x_ref, y_ref))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    img_s = batch / dt

    print(
        json.dumps(
            {
                "metric": "de-id images/sec/chip (camera+FAN+generator, 128x128)",
                "value": round(img_s, 1),
                "unit": "img/s",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
