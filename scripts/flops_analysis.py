"""XLA cost analysis of each de-id stage: FLOPs + bytes -> roofline/MFU.

Compile-only (no execution); prints one JSON line per stage.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid, deid_from_reference
from ppvision_tpu.models.fan import get_heatmap
from ppvision_tpu.optics.camera import camera_apply

BATCH = int(__import__("os").environ.get("PPVISION_BENCH_BATCH", "256"))


def analyze(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(
        json.dumps(
            {
                "stage": name,
                "batch": BATCH,
                "gflops_total": round(flops / 1e9, 2),
                "gflops_per_img": round(flops / 1e9 / BATCH, 3),
                "gbytes": round(bytes_ / 1e9, 3),
                "arith_intensity": round(flops / max(bytes_, 1), 1),
            }
        ),
        flush=True,
    )


def main():
    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)
    p = bundle.params
    x = jnp.zeros((BATCH, 128, 128, 3))
    xp = jnp.zeros((BATCH, 128, 128, 3))
    y = jnp.zeros((BATCH,), jnp.int32)
    s = jnp.zeros((BATCH, cfg.model.style_dim))
    masks = (jnp.zeros((BATCH, 256, 256, 1)),) * 2

    # Params as args: closure constants inflate the compile payload.
    analyze(
        "camera", lambda pp, xx: camera_apply(pp.camera, pp.camera_consts, xx)[0], p, x
    )
    analyze(
        "fan_priv",
        lambda fp, xx: get_heatmap(bundle.fan, fp, xx, privacy=True),
        p.fan_priv, xp,
    )
    analyze(
        "style_encoder",
        lambda ep, xx: bundle.models["style_encoder"].apply({"params": ep}, xx, y),
        p.style_encoder, x,
    )
    analyze(
        "generator",
        lambda gp, xx, ss, mm: bundle.models["generator"].apply(
            {"params": gp}, xx, ss, mm
        ),
        p.generator, xp, s, masks,
    )
    analyze(
        "full_pipeline",
        lambda pp, xs, xr, yr: deid_from_reference(bundle, pp, xs, xr, yr),
        p, x, x, y,
    )


if __name__ == "__main__":
    main()
