"""Lens area-downsample parity vs the reference torch implementation
(``Image_Caption/Camera/Utils.py:216-248``), including the general
nearest-resize path (upsample factor capped at 10) that round 5
implemented — previously the repo's only NotImplementedError."""

import numpy as np
import pytest
import torch

from .golden_reference import import_caption_lens


def _torch_area_downsample(x_hw_c: np.ndarray, target: int) -> np.ndarray:
    OpticsZernike = import_caption_lens()
    import importlib

    utils = importlib.import_module(
        OpticsZernike.__module__.rsplit(".", 1)[0] + ".Utils"
    )
    t = torch.from_numpy(x_hw_c[None])  # (1, H, W, C)
    out = utils.area_downsampling_tf(t, target)
    return out.numpy()[0]


def _ours(x_hw_c: np.ndarray, n: int, p: int) -> np.ndarray:
    import jax.numpy as jnp

    from ppvision_tpu.optics.lens import _downsample_plan

    psf = jnp.asarray(x_hw_c)
    factor, up = _downsample_plan(n, p)
    if up > 1:
        psf = jnp.repeat(jnp.repeat(psf, up, axis=0), up, axis=1)
    elif factor * p != psf.shape[0]:
        from ppvision_tpu.ops.image import resize_nearest

        psf = resize_nearest(psf, (factor * p, factor * p))
    return np.asarray(psf.reshape(p, factor, p, factor, -1).mean(axis=(1, 3)))


@pytest.mark.parametrize(
    "n,p",
    [
        (64, 32),    # integer ratio: plain pool
        (96, 64),    # lcm path: x2 nearest up, pool 3 (the 896->256 shape)
        (100, 64),   # lcm factor 25 > 10: capped lossy x10 nearest path
        (72, 64),    # lcm factor 9 <= 10: exact lcm path
    ],
)
def test_area_downsample_matches_reference(n, p):
    rng = np.random.default_rng(0)
    x = rng.random((n, n, 3)).astype(np.float32)
    want = _torch_area_downsample(x, p)
    got = _ours(x, n, p)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
