"""Video de-id path: interpolation video assembly + temporal metric."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid
from ppvision_tpu.sample import get_alphas, video_latent, video_ref

IMG = 32


def test_get_alphas_schedule():
    a = get_alphas()
    assert a[0] == 0.0 and a[-1] == 1.0
    assert len(a) == 1 + 20 + 10
    assert np.all(np.diff(a) >= 0)


@pytest.fixture(scope="module")
def bundle():
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
    )
    return build_deid(jax.random.key(0), cfg)


@pytest.mark.slow
def test_video_ref_shapes(bundle, tmp_path):
    b = 2
    x_src = jax.random.uniform(jax.random.key(1), (b, IMG, IMG, 3))
    x_ref = jax.random.uniform(jax.random.key(2), (3, IMG, IMG, 3))
    y_ref = jnp.zeros((3,), jnp.int32)  # same domain -> 2 segments
    path = str(tmp_path / "v.mp4")
    video = video_ref(bundle, bundle.params, x_src, x_ref, y_ref, path)
    t = len(get_alphas())
    # 2 segments of T frames + 10 freeze frames.
    assert video.shape[0] == 2 * t + 10
    # height 2*IMG (src row over fake row); width slide-panel + b*IMG.
    assert video.shape[1] == 2 * IMG
    assert video.shape[2] == (IMG + 32) + b * IMG
    assert np.isfinite(video).all() and video.min() >= 0.0 and video.max() <= 1.0


@pytest.mark.slow
def test_video_latent_shapes(bundle, tmp_path):
    b = 2
    x_src = jax.random.uniform(jax.random.key(1), (b, IMG, IMG, 3))
    zs = [
        jax.random.normal(jax.random.key(k), (b, bundle.cfg.model.latent_dim))
        for k in (3, 4)
    ]
    video = video_latent(
        bundle, bundle.params, x_src, y_list=[0], z_list=zs, psi=0.7,
        fname=str(tmp_path / "vl.mp4"),
    )
    t = len(get_alphas())
    assert video.shape[0] == t + 10
    assert video.shape[1] == 2 * IMG and video.shape[2] == b * IMG


@pytest.mark.slow
def test_flow_consistency_metric():
    from ppvision_tpu.metrics.temporal import flow_consistency
    from ppvision_tpu.models.raft import RAFT

    raft = RAFT(corr_levels=2, corr_radius=2)
    x0 = jnp.zeros((1, IMG, IMG, 3))
    params = raft.init(jax.random.key(0), x0, x0, iters=1)["params"]
    frames = jax.random.uniform(jax.random.key(1), (3, IMG, IMG, 3))
    # identical sequences -> exactly consistent
    assert flow_consistency(raft, params, frames, frames, iters=1) == pytest.approx(
        0.0, abs=1e-5
    )
    other = jax.random.uniform(jax.random.key(2), (3, IMG, IMG, 3))
    assert flow_consistency(raft, params, frames, other, iters=1) >= 0.0
