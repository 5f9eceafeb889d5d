"""GAN training-step throughput at the reference recipe (256^2, batch 4).

The reference trains 300k iters in ~3 days on one V100
(Face-DeId/README.md:81-85) = ~0.86 s/iter. This measures our one-jit
train step (D/D/G/G + EMA + R1) on the current backend. Prints JSON.

Env: PPVISION_TRAIN_BATCH (default 4), PPVISION_TRAIN_IMG (default 256),
PPVISION_TRAIN_AUX=1 to include LPIPS+flow (random weights).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig, TrainConfig
from ppvision_tpu.optics.camera import CameraSpec, init_camera_params, make_camera_constants
from ppvision_tpu.train.gan import FrozenNets, init_gan, make_train_step

REF_SEC_PER_ITER = 3 * 24 * 3600 / 300_000  # 0.864 s on 1x V100


def main():
    b = int(os.environ.get("PPVISION_TRAIN_BATCH", "4"))
    img = int(os.environ.get("PPVISION_TRAIN_IMG", "256"))
    aux = os.environ.get("PPVISION_TRAIN_AUX", "0") == "1"
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=img),
        camera=CameraConfig(n=img),
        train=TrainConfig(batch_size=b, flow_iters=20 if aux else 1),
    )
    models, fan, state = init_gan(jax.random.key(0), cfg)
    spec = CameraSpec(n=img, zernike_terms=cfg.camera.zernike_terms)
    fan_params = fan.init(jax.random.key(1), jnp.zeros((1, 256, 256, 3)))["params"]
    frozen = FrozenNets(
        camera_params=init_camera_params(jax.random.key(2), spec),
        camera_consts=make_camera_constants(spec),
        fan_params=fan_params,
        fan_priv_params=fan_params,
    )
    lpips_fn = flow_fn = None
    if aux:
        from ppvision_tpu.train.aux_losses import build_flow_fn, build_lpips_fn

        lpips_fn, _ = build_lpips_fn(img, key=jax.random.key(3))
        flow_fn, _ = build_flow_fn(key=jax.random.key(4), iters=20, image_size=img)
    step_fn = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=flow_fn)

    ks = jax.random.split(jax.random.key(5), 6)
    batch = dict(
        x_src=jax.random.uniform(ks[0], (b, img, img, 3)),
        y_src=jnp.zeros((b,), jnp.int32),
        x_ref=jax.random.uniform(ks[1], (b, img, img, 3)),
        x_ref2=jax.random.uniform(ks[2], (b, img, img, 3)),
        y_ref=jnp.ones((b,), jnp.int32),
        z_trg=jax.random.normal(ks[3], (b, cfg.model.latent_dim)),
        z_trg2=jax.random.normal(ks[4], (b, cfg.model.latent_dim)),
    )

    state, metrics = step_fn(state, frozen, batch)  # compile
    float(metrics["G/latent_adv"])  # sync
    # Steady-state training dispatches iterations back-to-back and reads
    # metrics only occasionally; syncing EVERY iteration adds the ~30 ms
    # tunnel host-transfer to each measurement.  Chain K dependent steps
    # (state threads through) with one trailing sync and divide.
    k = int(os.environ.get("PPVISION_TRAIN_CHAIN", "8"))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = step_fn(state, frozen, batch)
        float(metrics["G/latent_adv"])
        times.append((time.perf_counter() - t0) / k)
    dt = min(times)
    print(
        json.dumps(
            {
                "metric": f"GAN train s/iter (batch {b}, {img}^2, aux={aux})",
                "value": round(dt, 4),
                "unit": "s/iter",
                "ref_v100_s_per_iter": REF_SEC_PER_ITER,
                "speedup_vs_v100": round(REF_SEC_PER_ITER / dt, 2),
                "days_for_300k_iters": round(dt * 300_000 / 86400, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
