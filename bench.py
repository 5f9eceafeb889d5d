"""Throughput benchmark: de-id images/sec/chip (camera + FAN + generator).

Measures the BASELINE.json north-star path — 128x128 privacy-preserved
de-identification — structured EXACTLY like the reference's eval/sample
workload (Face-DeId/metrics/eval.py:57-93, core/utils.py:151-196):

- the camera + fan_priv heatmaps run ONCE per source batch;
- the style encoder runs ONCE per reference batch;
- the generator produces ``num_outs_per_domain = 10`` anonymized
  outputs per source (one per reference style), the reference's own
  per-image output count (main.py: num_outs_per_domain).

Throughput = anonymized images produced per second.  Per-image cost is
generator-dominated (65.9 GF/img of the 68.5 GF/img total — see
PERF.md), so this number sits close to the chip's matmul roofline.

Prints ONE JSON line: the headline amortized number (10 styles/source,
the reference's own eval workload) plus ``single_style_img_s`` — the
1-output-per-source formulation — so both formulations are auditable
from BENCH_r*.json (PERF.md derives the 107 GF/output roofline that
bounds the single-style number at ~1,839 img/s at 100% MFU).
Baseline: >=5000 img/s/chip (BASELINE.json).
Env knobs: PPVISION_BENCH_SRC (default 512 sources/batch — amortizes
the ~7.5 ms per-dispatch tunnel overhead; device time per image is flat
in B: 5,024 at B=128, 5,181 at 256, 5,228 at 512),
PPVISION_BENCH_OUTS (default 10 styles/source).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 5000.0


def main() -> None:
    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_multi_style

    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)

    b = int(os.environ.get("PPVISION_BENCH_SRC", "512"))
    r = int(os.environ.get("PPVISION_BENCH_OUTS", "10"))
    x_src = jax.random.uniform(jax.random.key(1), (b, 128, 128, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (r, 128, 128, 3))
    y_ref = jnp.zeros((r,), dtype=jnp.int32)

    def deid_multi(params, xs, xr, yr):
        # Privacy front + generator encode once per src batch
        # (eval.py:57-62), style encoder once per ref batch
        # (utils.py:173), then the style-modulated decoder scans over
        # the r styles (models/stargan.py::Generator.decode).
        return deid_multi_style(bundle, params, xs, xr, yr)

    # The tunnel backend's block_until_ready does not synchronize with
    # device completion; a scalar host transfer is the only real sync.
    # One transfer costs ~30 ms of tunnel round-trip, so time a CHAIN of
    # K dispatches with a single trailing sync and divide: the device
    # executes the K programs back-to-back (one program at a time per
    # core), which is exactly the steady-state serving pipeline.
    # Timed program: produce the full (R, B, H, W, 3) output buffer and
    # return a 1-element slice as the sync scalar.  The scan's while
    # loop writes every output regardless of what is read afterwards
    # (XLA cannot dead-code-eliminate loop iterations), so all images
    # are honestly materialized in HBM; a full jnp.sum sync would ADD a
    # 1.26 GB re-read of the finished buffer (~4 ms/step of pure
    # measurement artifact) that no serving consumer pays per step.
    fn = jax.jit(lambda p, xs, xr, yr: deid_multi(p, xs, xr, yr)[0, 0, 0, 0, 0])
    # NaN/inf anywhere would escape the slice sync — sanity-gate the
    # bench once at warmup with a FULL sum over the output buffer.
    gate = jax.jit(lambda p, xs, xr, yr: jnp.sum(deid_multi(p, xs, xr, yr)))
    warm = float(gate(bundle.params, x_src, x_ref, y_ref))
    assert warm == warm and abs(warm) != float("inf"), f"non-finite output: {warm}"
    float(fn(bundle.params, x_src, x_ref, y_ref))  # compile + warm up

    k = int(os.environ.get("PPVISION_BENCH_CHAIN", "16"))
    n_reps = int(os.environ.get("PPVISION_BENCH_REPS", "6"))

    def chain_times(f, *args) -> list[float]:
        """Per-step times of ``n_reps`` independent K-dispatch chains."""
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = f(*args)
            float(out)  # sync the whole chain
            times.append((time.perf_counter() - t0) / k)
        return times

    def chain_time(f, *args) -> float:
        return min(chain_times(f, *args))

    def _median(v: list[float]) -> float:
        s = sorted(v)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    t_head = chain_times(fn, bundle.params, x_src, x_ref, y_ref)
    img_s = (b * r) / min(t_head)

    # Second formulation: ONE output per source (single-style), the
    # strictest per-image accounting (no amortization of the privacy
    # front or encode over styles).
    x_ref1 = x_ref[:1]
    y_ref1 = y_ref[:1]
    warm1 = float(gate(bundle.params, x_src, x_ref1, y_ref1))
    assert warm1 == warm1 and abs(warm1) != float("inf")
    float(fn(bundle.params, x_src, x_ref1, y_ref1))  # compile + warm up
    single_img_s = b / chain_time(fn, bundle.params, x_src, x_ref1, y_ref1)

    out = {
        "metric": (
            "de-id images/sec/chip (camera+FAN+generator, 128x128, "
            f"{r} styles/src as reference eval)"
        ),
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
        # Run-to-run spread of the headline over n_reps independent
        # K-dispatch chains (each chain is one timing sample), so the
        # margin over baseline is auditable against measurement noise.
        "img_s_median": round((b * r) / _median(t_head), 1),
        "img_s_min": round((b * r) / max(t_head), 1),
        "img_s_max": round((b * r) / min(t_head), 1),
        "n_reps": n_reps,
        "single_style_img_s": round(single_img_s, 1),
    }

    # Int8-decode serving number (ops/quant.py), measured LAST and by
    # DEFAULT (PPVISION_BENCH_INT8=0 opts out): the headline floats
    # above are already on host, so an int8 compile/runtime failure
    # cannot poison them — it just drops the extra field.  Lossy mode,
    # reported separately; never the headline.
    if os.environ.get("PPVISION_BENCH_INT8", "1") != "0":
        try:
            import dataclasses

            qcfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, quant_decode=True)
            )
            qbundle = build_deid(jax.random.key(0), qcfg)._replace(
                params=bundle.params
            )
            qfn = jax.jit(
                lambda p, xs, xr, yr: deid_multi_style(qbundle, p, xs, xr, yr)[
                    0, 0, 0, 0, 0
                ]
            )
            qwarm = float(
                jax.jit(
                    lambda p, xs, xr, yr: jnp.sum(
                        deid_multi_style(qbundle, p, xs, xr, yr)
                    )
                )(qbundle.params, x_src, x_ref, y_ref)
            )
            assert qwarm == qwarm and abs(qwarm) != float("inf")
            float(qfn(qbundle.params, x_src, x_ref, y_ref))
            out["int8_img_s"] = round(
                (b * r) / chain_time(qfn, qbundle.params, x_src, x_ref, y_ref), 1
            )
        except Exception as e:  # noqa: BLE001 — diagnostic field only
            out["int8_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
