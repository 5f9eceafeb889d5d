"""FID / LPIPS structural tests (random weights; value parity needs ckpts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.metrics.fid import (
    InceptionV3,
    fid_from_activations,
    frechet_distance,
)
from ppvision_tpu.metrics.lpips import LPIPS, calculate_lpips_given_images


def test_frechet_distance_known_cases():
    mu = np.zeros(4)
    cov = np.eye(4)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)
    # Mean shift only: ||d||^2.
    d = frechet_distance(mu, cov, mu + 2.0, cov)
    assert d == pytest.approx(16.0, abs=1e-6)


def test_fid_from_activations_sanity():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 16))
    b = rng.standard_normal((500, 16))
    near = fid_from_activations(a, a[:250])
    far = fid_from_activations(a, b + 5.0)
    assert near < far


@pytest.mark.slow
def test_inception_forward_shape():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2048)
    # Parameter count ~ torchvision inception (conv+bn only): ~21.8M.
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params["params"]))
    assert 20e6 < n < 25e6, n


def test_lpips_properties():
    model = LPIPS()
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    y = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    params = model.init(jax.random.key(2), x, y)["params"]
    same = float(model.apply({"params": params}, x, x))
    diff = float(model.apply({"params": params}, x, y))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > same

    group = [x, y, jax.random.uniform(jax.random.key(3), (2, 64, 64, 3))]
    avg = calculate_lpips_given_images(model, params, group)
    assert avg > 0
