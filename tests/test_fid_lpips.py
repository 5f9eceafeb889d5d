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


@pytest.mark.slow
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


def _synthetic_inception_sd():
    """torchvision-inception_v3-shaped random state_dict (torchvision is
    absent in this env; shapes mirror torchvision.models.inception)."""
    rng = np.random.default_rng(7)
    sd = {}

    def basic(name, o, i, kh, kw):
        sd[f"{name}.conv.weight"] = (
            rng.standard_normal((o, i, kh, kw)).astype(np.float32) * 0.05
        )
        sd[f"{name}.bn.weight"] = np.ones((o,), np.float32)
        sd[f"{name}.bn.bias"] = np.zeros((o,), np.float32)
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(o).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = np.ones((o,), np.float32)

    basic("Conv2d_1a_3x3", 32, 3, 3, 3)
    basic("Conv2d_2a_3x3", 32, 32, 3, 3)
    basic("Conv2d_2b_3x3", 64, 32, 3, 3)
    basic("Conv2d_3b_1x1", 80, 64, 1, 1)
    basic("Conv2d_4a_3x3", 192, 80, 3, 3)

    def block_a(name, cin, pool):
        basic(f"{name}.branch1x1", 64, cin, 1, 1)
        basic(f"{name}.branch5x5_1", 48, cin, 1, 1)
        basic(f"{name}.branch5x5_2", 64, 48, 5, 5)
        basic(f"{name}.branch3x3dbl_1", 64, cin, 1, 1)
        basic(f"{name}.branch3x3dbl_2", 96, 64, 3, 3)
        basic(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        basic(f"{name}.branch_pool", pool, cin, 1, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)

    basic("Mixed_6a.branch3x3", 384, 288, 3, 3)
    basic("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    basic("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    basic("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def block_c(name, c7):
        basic(f"{name}.branch1x1", 192, 768, 1, 1)
        basic(f"{name}.branch7x7_1", c7, 768, 1, 1)
        basic(f"{name}.branch7x7_2", c7, c7, 1, 7)
        basic(f"{name}.branch7x7_3", 192, c7, 7, 1)
        basic(f"{name}.branch7x7dbl_1", c7, 768, 1, 1)
        basic(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        basic(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        basic(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        basic(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        basic(f"{name}.branch_pool", 192, 768, 1, 1)

    for n, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)):
        block_c(n, c7)

    basic("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    basic("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    basic("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    basic("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    basic("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    basic("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def block_e(name, cin):
        basic(f"{name}.branch1x1", 320, cin, 1, 1)
        basic(f"{name}.branch3x3_1", 384, cin, 1, 1)
        basic(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        basic(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        basic(f"{name}.branch3x3dbl_1", 448, cin, 1, 1)
        basic(f"{name}.branch3x3dbl_2", 384, 448, 3, 3)
        basic(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        basic(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        basic(f"{name}.branch_pool", 192, cin, 1, 1)

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return sd


@pytest.mark.slow
def test_inception_importer_matches_init_structure():
    """Converted torchvision-shaped weights must coincide with
    model.init's tree (names, shapes, both collections).  Branch-order
    mistakes are caught by the distinct branch channel counts."""
    from ppvision_tpu.utils.torch_import import inception_variables_from_torch

    model = InceptionV3()
    # 75^2 is the smallest input that keeps every stage >= 1x1.
    ref = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    conv = inception_variables_from_torch(_synthetic_inception_sd())

    for col in ("params", "batch_stats"):
        ref_paths = jax.tree_util.tree_flatten_with_path(ref[col])[0]
        conv_paths = jax.tree_util.tree_flatten_with_path(conv[col])[0]
        assert len(ref_paths) == len(conv_paths), col
        for (rp, rv), (cp, cv) in zip(ref_paths, conv_paths):
            assert rp == cp, col
            assert rv.shape == cv.shape, (col, rp)

    # Imported weights run, and FID of identical activation sets == 0.
    variables = jax.tree_util.tree_map(jnp.asarray, conv)
    x = jax.random.uniform(jax.random.key(1), (8, 75, 75, 3))
    acts = np.asarray(model.apply(variables, x))
    assert acts.shape == (8, 2048)
    assert np.isfinite(acts).all()
    a16 = acts[:, :16]  # keep sqrtm cheap
    assert fid_from_activations(a16, a16.copy()) == pytest.approx(0.0, abs=1e-4)


@pytest.mark.slow  # ~16 s of compile on 1 CPU
def test_pairwise_lpips_matches_loop():
    """make_pairwise_lpips_fn (one jit, features computed once) must
    reproduce the reference's 45-call pairwise loop values exactly."""
    from ppvision_tpu.metrics.lpips import make_pairwise_lpips_fn

    lpips = LPIPS()
    r, b, hw = 4, 2, 32  # 32 is AlexNet's minimum usable input here
    x0 = jnp.zeros((b, hw, hw, 3))
    params = lpips.init(jax.random.key(0), x0, x0)["params"]
    fakes = jax.random.uniform(jax.random.key(1), (r, b, hw, hw, 3))

    got = np.asarray(make_pairwise_lpips_fn(params, r)(fakes))
    want = []
    for i in range(r - 1):
        for j in range(i + 1, r):  # np.triu_indices order
            want.append(float(lpips.apply({"params": params}, fakes[i], fakes[j])))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-7)
    assert float(np.mean(got)) == pytest.approx(
        calculate_lpips_given_images(lpips, params, list(fakes)), rel=1e-5
    )
