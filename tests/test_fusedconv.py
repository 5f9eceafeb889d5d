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


def test_avg_pool_bf16_diag_conv_matches_slice_form():
    """The bf16/C>=8 diag-conv branch of avg_pool_2x must be bit-exact
    vs the slice form (both round one f32 accumulation to bf16)."""
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 32), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    got = np.asarray(avg_pool_2x(xb), jnp.float32)
    # Slice-form reference on the same bf16 values.
    xr = xb.reshape(2, 8, 2, 8, 2, 32)
    want = (
        xr[:, :, 0, :, 0].astype(jnp.float32)
        + xr[:, :, 1, :, 0]
        + xr[:, :, 0, :, 1]
        + xr[:, :, 1, :, 1]
    ) * 0.25
    np.testing.assert_array_equal(got, np.asarray(want.astype(jnp.bfloat16), jnp.float32))


def test_avg_pool_bf16_grad_of_grad():
    """R1-penalty pattern: d/dp of ||d/dx f(x; p)||^2 must trace through
    the diag-conv pool (regression: f32-preferred output broke the conv
    transpose under grad-of-grad)."""
    k = jnp.full((3, 3, 32, 32), 0.01, jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 32), jnp.bfloat16)

    def f(kk, xx):
        y = jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(avg_pool_2x(y).astype(jnp.float32))

    def r1(kk):
        g = jax.grad(f, argnums=1)(kk, x)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    g = jax.grad(r1)(k)
    assert np.all(np.isfinite(np.asarray(g, jnp.float32)))
