"""Per-stage breakdown of the de-id bench path on the current backend.

Times camera / fan_priv heatmap / style encoder / generator separately
(same shapes as bench.py), plus the fused whole pipeline. Prints JSON.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid, deid_from_reference
from ppvision_tpu.models.fan import get_heatmap
from ppvision_tpu.optics.camera import camera_apply

BATCH = int(__import__("os").environ.get("PPVISION_BENCH_BATCH", "256"))


def timeit(fn, *args, reps=6):
    float(fn(*args))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    cfg = FaceDeIdConfig(model=ModelConfig(img_size=128), camera=CameraConfig(n=128))
    bundle = build_deid(jax.random.key(0), cfg)
    p = bundle.params
    x_src = jax.random.uniform(jax.random.key(1), (BATCH, 128, 128, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (BATCH, 128, 128, 3))
    y_ref = jnp.zeros((BATCH,), dtype=jnp.int32)

    # NB: params must be ARGUMENTS (closure constants get baked into the
    # HLO and blow the remote-compile request size limit).
    cam = jax.jit(lambda pp, x: jnp.sum(camera_apply(pp.camera, pp.camera_consts, x)[0]))
    x_priv = jax.jit(lambda pp, x: camera_apply(pp.camera, pp.camera_consts, x)[0])(p, x_src)

    fanf = jax.jit(
        lambda fp, x: sum(
            jnp.sum(m) for m in get_heatmap(bundle.fan, fp, x, privacy=True)
        )
    )
    masks = jax.jit(lambda fp, x: get_heatmap(bundle.fan, fp, x, privacy=True))(
        p.fan_priv, x_priv
    )

    senc = jax.jit(
        lambda ep, x: jnp.sum(
            bundle.models["style_encoder"].apply({"params": ep}, x, y_ref)
        )
    )
    s_ref = jax.jit(
        lambda ep, x: bundle.models["style_encoder"].apply({"params": ep}, x, y_ref)
    )(p.style_encoder, x_ref)

    gen = jax.jit(
        lambda gp, x, s, m: jnp.sum(
            bundle.models["generator"].apply({"params": gp}, x, s, m)
        )
    )

    full = jax.jit(
        lambda pp, xs, xr, yr: jnp.sum(deid_from_reference(bundle, pp, xs, xr, yr))
    )

    out = {"batch": BATCH, "backend": jax.devices()[0].platform}

    def record(name, fn, *args):
        out[name] = round(timeit(fn, *args) * 1e3, 2)  # ms
        print(name, out[name], flush=True)

    record("camera_ms", cam, p, x_src)
    record("fan_priv_ms", fanf, p.fan_priv, x_priv)
    record("style_encoder_ms", senc, p.style_encoder, x_ref)
    record("generator_ms", gen, p.generator, x_priv, s_ref, masks)
    record("full_ms", full, p, x_src, x_ref, y_ref)
    out["full_img_s"] = round(BATCH / (out["full_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
