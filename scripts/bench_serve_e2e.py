"""Host -> chip integration bench: FaceBatcher's native JPEG pipeline
feeding DeIdServer on the real chip (VERDICT r5 item 7).

Builds a synthetic CelebA-like JPEG tree, measures

  1. host-only: FaceBatcher (fused C++ decode+transform) batch rate;
  2. end-to-end: the same batcher streaming sources into
     DeIdServer.serve (R styles per source) — aggregate anonymized
     outputs/s, per-request p50/p99, and the chip-idle fraction derived
     from the bench-measured device time per batch.

On this 1-core VM the pipeline is host-bound (~730 img/s/core fused
native rate, PERF.md round-4b) while the chip can consume ~5,230
outputs/s (523 sources/s at R=10): the report quantifies exactly that
gap.  Usage: python scripts/bench_serve_e2e.py
Env: PPVISION_E2E_IMAGES (default 1024), PPVISION_E2E_BATCH (128).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def make_jpeg_tree(root: str, n_per_class: int = 64, classes=("a", "b")):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            arr = (rng.random((218, 178, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(d, f"{i:04d}.jpg"), quality=92
            )


def main():
    n_images = int(os.environ.get("PPVISION_E2E_IMAGES", "1024"))
    batch = int(os.environ.get("PPVISION_E2E_BATCH", "128"))
    r = 10

    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.data.face import FaceBatcher
    from ppvision_tpu.deid import build_deid
    from ppvision_tpu.serve import DeIdServer

    tmp = tempfile.mkdtemp(prefix="ppv_e2e_")
    make_jpeg_tree(tmp)

    def fresh_batcher():
        return FaceBatcher(
            src_root=tmp, ref_root=tmp, img_size=128, batch_size=batch,
            seed=0, prefetch=2,
        )

    # 1) host-only rate.
    it = iter(fresh_batcher())
    next(it)  # warm the pool/prefetch
    n_batches = max(2, n_images // batch)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    host_dt = time.perf_counter() - t0
    host_img_s = n_batches * batch / host_dt

    # 2) end-to-end: batcher -> DeIdServer on the chip.
    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)
    x_ref = np.random.default_rng(1).random((r, 128, 128, 3)).astype(np.float32)
    y_ref = np.zeros((r,), np.int32)
    out_space = os.environ.get("PPVISION_E2E_OUT", "float32")
    server = DeIdServer(
        bundle, x_ref, y_ref, batch_size=batch, depth=4, out_space=out_space
    )
    server.warmup()
    server.reset_stats()

    # Raw device->host pull rate for one (R, B, H, W, 3) f32 result —
    # on the tunnel backend this transfer, not the host decode or the
    # chip, can dominate; measuring it attributes the e2e number.
    probe = server._dispatch(
        np.full((batch, 128, 128, 3), 0.5, np.float32)
    )
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    host = np.asarray(probe)
    pull_dt = time.perf_counter() - t0
    pull_gb_s = host.nbytes / pull_dt / 1e9

    def sources():
        it2 = iter(fresh_batcher())
        served = 0
        while served < n_images:
            b = next(it2)["x_src"]
            for img in np.asarray(b):
                if served >= n_images:
                    return
                served += 1
                yield img

    t0 = time.perf_counter()
    n_out = 0
    for out in server.serve(sources()):
        n_out += 1
    e2e_dt = time.perf_counter() - t0
    stats = server.stats()

    # Chip busy estimate: bench-measured device time per (batch, R)
    # dispatch at this shape (BENCH r5: ~5,231 outputs/s steady state).
    dev_s_per_batch = batch * r / 5231.5
    busy = stats["batches_dispatched"] * dev_s_per_batch
    print(json.dumps(dict(
        host_only_img_s=round(host_img_s, 1),
        e2e_sources_s=round(n_out / e2e_dt, 1),
        e2e_outputs_s=round(n_out * r / e2e_dt, 1),
        latency_p50_s=round(stats["latency_p50_s"], 3),
        latency_p99_s=round(stats["latency_p99_s"], 3),
        batches_dispatched=stats["batches_dispatched"],
        chip_busy_frac=round(min(busy / e2e_dt, 1.0), 3),
        chip_idle_frac=round(max(1.0 - busy / e2e_dt, 0.0), 3),
        result_pull_gb_s=round(pull_gb_s, 3),
        result_gb_per_batch=round(host.nbytes / 1e9, 2),
        transfer_bound_sources_s=round(batch / pull_dt, 1),
        n_sources=n_out, r_styles=r, batch=batch, out_space=out_space,
        note="host-bound on this 1-core VM: e2e_sources_s tracks "
             "host_only_img_s; chip_idle_frac is the headroom a "
             "multi-core host would fill",
    )))


if __name__ == "__main__":
    main()
