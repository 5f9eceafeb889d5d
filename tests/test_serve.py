"""DeIdServer batching/pipelining correctness (ppvision_tpu/serve.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid, deid_multi_style
from ppvision_tpu.serve import DeIdServer


@pytest.fixture(scope="module")
def tiny():
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=64, style_dim=16, latent_dim=8,
                          max_conv_dim=64, fan_input_size=64),
        camera=CameraConfig(n=32),
    )
    bundle = build_deid(jax.random.key(0), cfg)
    xr = np.asarray(jax.random.uniform(jax.random.key(2), (3, 64, 64, 3)))
    yr = np.zeros((3,), np.int32)
    return bundle, xr, yr


@pytest.mark.slow  # compiles the tiny de-id pipeline
def test_server_matches_direct_call_and_pads_tail(tiny):
    bundle, xr, yr = tiny
    rng = np.random.default_rng(0)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(5)]

    server = DeIdServer(bundle, xr, yr, batch_size=2, depth=1)
    server.warmup()
    outs = list(server.serve(imgs))
    assert len(outs) == 5  # 2 + 2 + 1 (padded tail batch)
    assert all(o.shape == (3, 64, 64, 3) for o in outs)

    # Order + values must EXACTLY match the same compiled program run
    # directly (the server adds batching/pipelining, not arithmetic; an
    # eager reference would differ by jit-vs-eager bf16 fusion noise).
    fn = jax.jit(
        lambda p, xs: deid_multi_style(bundle, p, xs, jnp.asarray(xr), jnp.asarray(yr))
    )
    direct = np.asarray(fn(bundle.params, jnp.asarray(np.stack(imgs[:2]))))
    np.testing.assert_array_equal(outs[0], direct[:, 0])
    np.testing.assert_array_equal(outs[1], direct[:, 1])
    tail = np.asarray(fn(
        bundle.params,
        jnp.asarray(np.stack([imgs[4], np.zeros((64, 64, 3), np.float32)])),
    ))
    np.testing.assert_array_equal(outs[4], tail[:, 0])


@pytest.mark.slow
def test_server_rejects_bad_shapes_and_args(tiny):
    bundle, xr, yr = tiny
    with pytest.raises(ValueError):
        DeIdServer(bundle, xr, yr, batch_size=0)
    server = DeIdServer(bundle, xr, yr, batch_size=2)
    with pytest.raises(ValueError):
        list(server.serve([np.zeros((32, 32, 3), np.float32)]))
