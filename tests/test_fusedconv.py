"""Fused resample+conv ops must match the naive op pair exactly (f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.ops.fusedconv import conv3x3_avgpool2x, conv3x3_nearest_up2x
from ppvision_tpu.ops.image import avg_pool_2x, upsample_nearest_2x


def _conv3x3_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("h,w,ci,co", [(8, 8, 5, 7), (16, 12, 3, 4)])
def test_nearest_up_conv_matches_naive(h, w, ci, co):
    kx, kk = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (2, h, w, ci), jnp.float32)
    k = jax.random.normal(kk, (3, 3, ci, co), jnp.float32)
    want = _conv3x3_same(upsample_nearest_2x(x), k)
    got = conv3x3_nearest_up2x(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,w,ci,co", [(8, 8, 5, 7), (16, 12, 3, 4)])
def test_conv_avgpool_matches_naive(h, w, ci, co):
    kx, kk = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (2, h, w, ci), jnp.float32)
    k = jax.random.normal(kk, (3, 3, ci, co), jnp.float32)
    want = avg_pool_2x(_conv3x3_same(x, k))
    got = conv3x3_avgpool2x(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_ops_differentiable():
    x = jnp.ones((1, 8, 8, 4))
    k = jnp.full((3, 3, 4, 4), 0.1, jnp.float32)
    g = jax.grad(lambda kk: jnp.sum(conv3x3_nearest_up2x(x, kk)))(k)
    assert np.all(np.isfinite(np.asarray(g)))
    g = jax.grad(lambda kk: jnp.sum(conv3x3_avgpool2x(x, kk)))(k)
    assert np.all(np.isfinite(np.asarray(g)))
