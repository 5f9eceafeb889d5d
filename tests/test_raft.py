"""RAFT + local correlation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.models import raft as raft_mod
from ppvision_tpu.ops.corr import (
    alternate_corr_lookup,
    local_corr_pallas,
    local_corr_xla,
)


def test_bilinear_sampler_matches_manual():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 5, 6, 2)).astype(np.float32))
    coords = jnp.asarray([[[[1.5, 2.25]]]])  # x=1.5, y=2.25
    out = np.asarray(raft_mod.bilinear_sampler(img, coords))[0, 0, 0]
    i = np.asarray(img)[0]
    want = (
        i[2, 1] * 0.5 * 0.75 + i[2, 2] * 0.5 * 0.75
        + i[3, 1] * 0.5 * 0.25 + i[3, 2] * 0.5 * 0.25
    )
    np.testing.assert_allclose(out, want, rtol=1e-5)
    # Out of bounds -> zeros.
    oob = raft_mod.bilinear_sampler(img, jnp.asarray([[[[-3.0, -3.0]]]]))
    np.testing.assert_array_equal(np.asarray(oob), 0.0)


@pytest.mark.slow
def test_local_corr_xla_matches_allpairs_lookup():
    """At pyramid level 0 the on-demand local correlation must equal the
    all-pairs-volume lookup (the two reference CorrBlocks agree there)."""
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 6, 6, 8
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    coords = raft_mod.coords_grid(b, h, w) + jnp.asarray(
        rng.uniform(-2, 2, (b, h, w, 2)).astype(np.float32)
    )

    pyramid = raft_mod.build_corr_pyramid(f1, f2, num_levels=1)
    want = np.asarray(raft_mod.lookup_corr_pyramid(pyramid, coords, radius=2))
    got = np.asarray(local_corr_xla(f1, f2, coords, radius=2)) / np.sqrt(c)
    # The pyramid lookup uses the reference CorrBlock's x-major channel
    # order; local_corr uses the CUDA alternate kernel's y-major order
    # (the two reference implementations genuinely differ) — so compare
    # through a KxK transpose.
    k = 5
    got_t = got.reshape(*got.shape[:3], k, k).swapaxes(-1, -2).reshape(got.shape)
    np.testing.assert_allclose(got_t, want, atol=2e-5)


@pytest.mark.slow
def test_local_corr_pallas_matches_xla_interpret():
    rng = np.random.default_rng(2)
    b, h, w, c = 1, 4, 8, 16
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    coords = raft_mod.coords_grid(b, h, w) + jnp.asarray(
        rng.uniform(-3, 3, (b, h, w, 2)).astype(np.float32)
    )
    want = np.asarray(local_corr_xla(f1, f2, coords, radius=3))
    got = np.asarray(local_corr_pallas(f1, f2, coords, radius=3, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # Far out-of-bounds coords are exactly zero on both paths.
    far = coords + 100.0
    got_far = np.asarray(local_corr_pallas(f1, f2, far, radius=3, interpret=True))
    np.testing.assert_array_equal(got_far, 0.0)
    np.testing.assert_array_equal(np.asarray(local_corr_xla(f1, f2, far, 3)), 0.0)


@pytest.mark.slow
def test_alternate_corr_lookup_shape():
    b, h, w, c = 1, 8, 8, 16
    f1 = jnp.ones((b, h, w, c))
    f2 = jnp.ones((b, h, w, c))
    coords = raft_mod.coords_grid(b, h, w)
    out = alternate_corr_lookup(f1, f2, coords, num_levels=3, radius=2)
    assert out.shape == (b, h, w, 3 * 25)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_raft_forward_and_loss():
    model = raft_mod.RAFT(iters=2)
    img1 = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3)) * 255.0
    params = model.init(jax.random.key(2), img1, img2)["params"]
    flow = model.apply({"params": params}, img1, img2)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()

    loss = raft_mod.raft_flow_loss(model, params, img1, img2, iters=2)
    assert np.isfinite(float(loss))


@pytest.mark.slow  # two tiny-RAFT compiles
def test_raft_alternate_corr_matches_dense():
    """RAFT(alternate_corr=True) — the reference's --alternate_corr /
    alt_cuda_corr path (RAFT/core/corr.py:63-91) — must equal the dense
    corr-pyramid path at the SAME params: pooling fmap2 commutes with
    the correlation dot, and the K^2 channel order is re-laid to the
    dense layout so converted update-block weights are interchangeable."""
    model = raft_mod.RAFT(iters=3, corr_levels=3, corr_radius=3)
    alt = raft_mod.RAFT(iters=3, corr_levels=3, corr_radius=3, alternate_corr=True)
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    im1 = jax.random.uniform(k1, (2, 64, 64, 3)) * 255.0
    im2 = jax.random.uniform(k2, (2, 64, 64, 3)) * 255.0
    params = model.init(k3, im1, im2, iters=1)["params"]
    dense = np.asarray(model.apply({"params": params}, im1, im2))
    ondemand = np.asarray(alt.apply({"params": params}, im1, im2))
    assert dense.shape == ondemand.shape
    scale = np.abs(dense).max() + 1e-6
    np.testing.assert_allclose(ondemand, dense, atol=2e-4 * scale, rtol=1e-4)
