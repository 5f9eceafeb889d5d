"""Per-stage breakdown of the de-id bench path on the current backend.

Times camera / fan_priv heatmap / style encoder / generator separately
(same shapes as bench.py), plus the fused whole pipeline. Prints JSON.
"""

import json
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

    cam = jax.jit(lambda x: jnp.sum(camera_apply(p.camera, p.camera_consts, x)[0]))
    x_priv = jax.jit(lambda x: camera_apply(p.camera, p.camera_consts, x)[0])(x_src)

    fanf = jax.jit(
        lambda x: sum(
            jnp.sum(m) for m in get_heatmap(bundle.fan, p.fan_priv, x, privacy=True)
        )
    )
    masks = jax.jit(lambda x: get_heatmap(bundle.fan, p.fan_priv, x, privacy=True))(x_priv)

    senc = jax.jit(
        lambda x: jnp.sum(
            bundle.models["style_encoder"].apply({"params": p.style_encoder}, x, y_ref)
        )
    )
    s_ref = jax.jit(
        lambda x: bundle.models["style_encoder"].apply({"params": p.style_encoder}, x, y_ref)
    )(x_ref)

    gen = jax.jit(
        lambda x, s, m: jnp.sum(
            bundle.models["generator"].apply({"params": p.generator}, x, s, m)
        )
    )

    full = jax.jit(
        lambda xs, xr, yr: jnp.sum(deid_from_reference(bundle, p, xs, xr, yr))
    )

    out = {"batch": BATCH, "backend": jax.devices()[0].platform}

    def record(name, fn, *args):
        out[name] = round(timeit(fn, *args) * 1e3, 2)  # ms
        print(name, out[name], flush=True)

    record("camera_ms", cam, x_src)
    record("fan_priv_ms", fanf, x_priv)
    record("style_encoder_ms", senc, x_ref)
    record("generator_ms", gen, x_priv, s_ref, masks)
    record("full_ms", full, x_src, x_ref, y_ref)
    out["full_img_s"] = round(BATCH / (out["full_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
