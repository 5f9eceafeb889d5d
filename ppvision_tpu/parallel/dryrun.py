"""Multi-chip dry run: one FULL sharded train step on an n-device mesh,
for BOTH trainers (GAN de-id and privacy captioning).

The TPU-native replacement for the reference's ``nn.DataParallel``
training (``Face-DeId/core/model.py:281-308``): the batch axis is
sharded over the ``data`` mesh axis, parameters/EMA/optimizer state are
replicated, and XLA inserts the gradient all-reduces inside the jitted
step.  The GAN step runs with the full paper loss — LPIPS, RAFT flow
and the heatmap-L1 term all active (solver.py:161-184) — so the aux
nets' gathers and reductions are exercised under GSPMD too.

Run directly (``python -m ppvision_tpu.parallel.dryrun N``) inside an
environment that provides N devices — the ``__main__`` block force-sets
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count`` so it
is self-provisioning regardless of the caller's backend.
"""

from __future__ import annotations

import os
import sys


def _force_virtual_cpu_env(n_devices: int) -> None:
    """Pin env to an n-device virtual CPU mesh (before jax import)."""
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("JAX_PLATFORM_NAME", None)
    # A sitecustomize may have pinned jax.config to another backend at
    # interpreter start; the env var alone does not undo that.
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    """One data-parallel GAN train step over an ``n_devices`` mesh.

    Requires ``len(jax.devices()) >= n_devices`` in the current process.
    Exercises every trained net (G/M/E/D), the frozen camera + FAN, R1
    grad-of-grad, per-net optax updates and the EMA lerp — the complete
    training step — on tiny shapes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..config import CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig
    from ..optics.camera import CameraSpec, init_camera_params, make_camera_constants
    from ..train.aux_losses import build_flow_fn, build_lpips_fn
    from ..train.gan import FrozenNets, init_gan, make_train_step

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"on platform {devices[0].platform!r}"
        )

    img = 32  # tiny shapes: still exercises every net and the sharding
    cfg = FaceDeIdConfig(
        model=ModelConfig(
            img_size=img, fan_input_size=64, max_conv_dim=64, style_dim=16,
        ),
        camera=CameraConfig(n=img, zernike_terms=32),
        loss=LossConfig(lambda_heatmap=1.0),
    )
    mesh = Mesh(devices[:n_devices], axis_names=("data",))

    key = jax.random.key(0)
    models, fan, state = init_gan(key, cfg)
    spec = CameraSpec(n=img, zernike_terms=cfg.camera.zernike_terms)
    fan_params = fan.init(jax.random.key(1), jnp.zeros((1, 256, 256, 3)))["params"]
    frozen = FrozenNets(
        camera_params=init_camera_params(jax.random.key(2), spec),
        camera_consts=make_camera_constants(spec),
        fan_params=fan_params,
        fan_priv_params=fan_params,
    )

    b = 2 * n_devices
    batch = dict(
        x_src=jnp.ones((b, img, img, 3)) * 0.5,
        y_src=jnp.zeros((b,), dtype=jnp.int32),
        x_ref=jnp.ones((b, img, img, 3)) * 0.4,
        x_ref2=jnp.ones((b, img, img, 3)) * 0.6,
        y_ref=jnp.ones((b,), dtype=jnp.int32),
        z_trg=jnp.ones((b, cfg.model.latent_dim)) * 0.1,
        z_trg2=jnp.ones((b, cfg.model.latent_dim)) * -0.1,
    )

    # Full paper loss: LPIPS + RAFT flow + heatmap L1 (solver.py:161-184),
    # so the aux nets' bilinear gathers run under GSPMD in the dry run.
    lpips_fn, _ = build_lpips_fn(img, key=jax.random.key(3))
    flow_fn, _ = build_flow_fn(
        key=jax.random.key(4), iters=1, image_size=img, corr_levels=2, corr_radius=2
    )

    with mesh:
        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        batch = {
            k: jax.device_put(
                v, batch_sharding if v.ndim > 0 and v.shape[0] == b else replicated
            )
            for k, v in batch.items()
        }
        state = jax.device_put(state, replicated)
        frozen = jax.device_put(frozen, replicated)
        train_step = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=flow_fn)
        new_state, metrics = train_step(state, frozen, batch)
        jax.block_until_ready(new_state.params["generator"])
    assert int(new_state.step) == 1
    for k in ("G/ref_lpips", "G/latent_flow", "G/latent_heatmap_l1"):
        assert k in metrics, f"aux loss {k} missing from sharded step"
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"non-finite metric {k}"


def run_caption(n_devices: int) -> None:
    """One data-parallel captioning train step over an ``n_devices`` mesh.

    Exercises the lens camera (batch-global max normalize,
    optics/lens.py:315-321), the BatchNorm encoder (global-batch stats
    under GSPMD), the masked-scan decoder and all three optimizers —
    mirroring ``cli/caption.py::run_train``'s mesh wiring on tiny shapes.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..config import CaptionConfig
    from ..optics.lens import LensSpec, init_lens_params, make_lens_constants
    from ..train.caption import init_caption, make_caption_train_step

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, have {len(devices)}")

    cfg = CaptionConfig(
        emb_dim=16, attention_dim=16, decoder_dim=16, encoded_image_size=4,
        batch_size=2 * n_devices,
    )
    spec = LensSpec(wave_res=64, patch_size=32, zernike_terms=16)
    consts = make_lens_constants(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, 30, spec, init_lens_params(spec),
        encoder_stages=(1, 1, 1, 1),
    )
    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)

    b = cfg.batch_size
    batch = dict(
        images=jnp.ones((b, 32, 32, 3)) * 0.5,
        captions=jnp.ones((b, 10), dtype=jnp.int32),
        caption_lengths=jnp.full((b,), 10),
    )
    mesh = Mesh(devices[:n_devices], axis_names=("data",))
    with mesh:
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        batch = {k: jax.device_put(v, shard) for k, v in batch.items()}
        state = jax.device_put(state, rep)
        new_state, metrics = step(state, batch, jax.random.key(1))
        jax.block_until_ready(new_state.decoder)
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"non-finite caption metric {k}"


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    _force_virtual_cpu_env(n)
    run(n)
    run_caption(n)
    print(f"dryrun_multichip OK on {n} virtual CPU devices (gan+caption)")
