"""Multi-chip dry run: one FULL sharded GAN train step on an n-device mesh.

The TPU-native replacement for the reference's ``nn.DataParallel``
training (``Face-DeId/core/model.py:281-308``): the batch axis is
sharded over the ``data`` mesh axis, parameters/EMA/optimizer state are
replicated, and XLA inserts the gradient all-reduces inside the jitted
step.

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
        loss=LossConfig(lambda_heatmap=0.0),  # value-only term; skip in dry run
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
        train_step = make_train_step(models, fan, cfg)
        new_state, metrics = train_step(state, frozen, batch)
        jax.block_until_ready(new_state.params["generator"])
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"non-finite metric {k}"


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    _force_virtual_cpu_env(n)
    run(n)
    print(f"dryrun_multichip OK on {n} virtual CPU devices")
