"""GAN train-step: one full iteration on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig
from ppvision_tpu.optics.camera import CameraSpec, init_camera_params, make_camera_constants
from ppvision_tpu.train.gan import (
    FrozenNets,
    init_gan,
    lambda_ds_schedule,
    make_train_step,
)

IMG = 32


@pytest.fixture(scope="module")
def setup():
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
        loss=LossConfig(lambda_heatmap=0.0),
    )
    models, fan, state = init_gan(jax.random.key(0), cfg)
    spec = CameraSpec(n=IMG, zernike_terms=cfg.camera.zernike_terms)
    fan_params = fan.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
    frozen = FrozenNets(
        camera_params=init_camera_params(jax.random.key(2), spec),
        camera_consts=make_camera_constants(spec),
        fan_params=fan_params,
        fan_priv_params=fan_params,
    )
    b = 2
    k = jax.random.key(3)
    ks = jax.random.split(k, 6)
    batch = dict(
        x_src=jax.random.uniform(ks[0], (b, IMG, IMG, 3)),
        y_src=jnp.zeros((b,), dtype=jnp.int32),
        x_ref=jax.random.uniform(ks[1], (b, IMG, IMG, 3)),
        x_ref2=jax.random.uniform(ks[2], (b, IMG, IMG, 3)),
        y_ref=jnp.ones((b,), dtype=jnp.int32),
        z_trg=jax.random.normal(ks[3], (b, cfg.model.latent_dim)),
        z_trg2=jax.random.normal(ks[4], (b, cfg.model.latent_dim)),
    )
    return cfg, models, fan, state, frozen, batch


@pytest.mark.slow
def test_one_train_step(setup):
    cfg, models, fan, state, frozen, batch = setup
    step = make_train_step(models, fan, cfg)
    new_state, metrics = step(state, frozen, batch)

    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    for key in ("D/latent_real", "D/latent_reg", "G/latent_adv", "G/ref_cyc"):
        assert key in metrics

    # Every trained net moved; EMA moved toward new params but not onto them.
    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    for net in ("generator", "mapping_network", "style_encoder", "discriminator"):
        assert delta(new_state.params[net], state.params[net]) > 0, net
    for net in ("generator", "mapping_network", "style_encoder"):
        d_ema = delta(new_state.ema_params[net], state.ema_params[net])
        d_par = delta(new_state.params[net], state.params[net])
        assert 0 < d_ema < d_par, net

    # R1 regularizer is strictly positive on random data.
    assert float(metrics["D/latent_reg"]) > 0


def test_lambda_ds_schedule():
    cfg = FaceDeIdConfig()
    assert float(lambda_ds_schedule(cfg, jnp.asarray(0))) == pytest.approx(1.0)
    mid = float(lambda_ds_schedule(cfg, jnp.asarray(cfg.loss.ds_iter // 2)))
    assert mid == pytest.approx(0.5, rel=1e-4)
    assert float(lambda_ds_schedule(cfg, jnp.asarray(cfg.loss.ds_iter * 2))) == 0.0


@pytest.mark.slow
def test_train_step_with_aux_losses(setup):
    """Full G steps with LPIPS + RAFT flow terms plugged in."""
    from ppvision_tpu.train.aux_losses import build_flow_fn, build_lpips_fn
    from ppvision_tpu.train.gan import make_train_step

    cfg, models, fan, state, frozen, batch = setup
    lpips_fn, _ = build_lpips_fn(IMG, key=jax.random.key(7))
    flow_fn, _ = build_flow_fn(
        key=jax.random.key(8), iters=1, image_size=IMG, corr_levels=2, corr_radius=2
    )
    step = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=flow_fn)
    new_state, metrics = step(state, frozen, batch)
    assert "G/ref_lpips" in metrics and "G/latent_flow" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
