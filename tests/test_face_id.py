"""Face-ID embedding net: structure, importer mapping, cosine metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.metrics.face_id import (
    ARCFACE_TEMPLATE,
    IResNet,
    arcface_variables_from_torch,
    face_id_cosine,
    fan_five_points,
    make_aligned_embed_fn,
    make_embed_fn,
    similarity_from_points,
    warp_to_template,
)

# Tiny iresnet (layers 1,1,1,1) keeps CPU runtime small; the importer
# mapping is layer-count generic so it exercises the same code paths.
LAYERS = (1, 1, 1, 1)


def _synthetic_iresnet_sd(layers=LAYERS, rng=None):
    """insightface-iresnet-shaped random state_dict (torch absent for
    this net; shapes mirror iresnet.py)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32) * 0.1 + 1
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = (
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05
        )

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    sd["prelu.weight"] = np.full((64,), 0.25, np.float32)
    widths = (64, 128, 256, 512)
    c_in = 64
    for li, (w, n) in enumerate(zip(widths, layers), start=1):
        for bi in range(n):
            t = f"layer{li}.{bi}"
            bn(f"{t}.bn1", c_in if bi == 0 else w)
            conv(f"{t}.conv1", w, c_in if bi == 0 else w, 3)
            bn(f"{t}.bn2", w)
            sd[f"{t}.prelu.weight"] = np.full((w,), 0.25, np.float32)
            conv(f"{t}.conv2", w, w, 3)
            bn(f"{t}.bn3", w)
            if bi == 0:
                conv(f"{t}.downsample.0", w, c_in, 1)
                bn(f"{t}.downsample.1", w)
        c_in = w
    bn("bn2", 512)
    sd["fc.weight"] = rng.standard_normal((512, 512 * 7 * 7)).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros((512,), np.float32)
    bn("features", 512)
    return sd


@pytest.mark.slow
def test_importer_matches_init_structure():
    model = IResNet(layers=LAYERS)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))["params"]
    conv = arcface_variables_from_torch(_synthetic_iresnet_sd(), layers=LAYERS)

    ref_paths = jax.tree_util.tree_flatten_with_path(ref)[0]
    conv_paths = jax.tree_util.tree_flatten_with_path(conv)[0]
    assert len(ref_paths) == len(conv_paths)
    for (rp, rv), (cp, cv) in zip(ref_paths, conv_paths):
        assert rp == cp
        assert rv.shape == cv.shape, rp


@pytest.mark.slow
def test_embedding_unit_norm_and_cosine():
    model = IResNet(layers=LAYERS)
    params = arcface_variables_from_torch(_synthetic_iresnet_sd(), layers=LAYERS)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    embed = make_embed_fn(model, params)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    e = embed(x)
    assert e.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5)
    # cos(x, x) == 1; cos(x, y) < 1 for distinct images.
    assert float(face_id_cosine(embed, x, x)) == pytest.approx(1.0, abs=1e-5)
    y = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    assert float(face_id_cosine(embed, x, y)) < 1.0


def test_similarity_solve_recovers_known_transform():
    """The closed-form similarity solve must exactly recover a known
    rotation+scale+translation applied to the template points."""
    theta, scale, tx, ty = 0.3, 1.7, -12.0, 31.0
    a = scale * np.cos(theta)
    b = scale * np.sin(theta)
    mat_true = np.array([[a, -b], [b, a]], np.float32)
    t_true = np.array([tx, ty], np.float32)
    dst = ARCFACE_TEMPLATE
    src = (dst - t_true) @ np.linalg.inv(mat_true).T  # src s.t. A@src+t=dst
    mat, t = similarity_from_points(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(mat), mat_true, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, rtol=1e-5, atol=1e-3)


def test_warp_to_template_maps_source_points():
    """Warping a linear-gradient image must place the value at each
    src point onto its template coordinate (bilinear is exact on
    affine images)."""
    h = 160
    yy, xx = np.mgrid[0:h, 0:h].astype(np.float32)
    img = np.stack([xx / h, yy / h, (xx + yy) / (2 * h)], axis=-1)[None]

    # Chosen so all src points land inside the 160^2 frame (the warp is
    # zeros outside).
    theta, scale = -0.2, 0.8
    a, b = scale * np.cos(theta), scale * np.sin(theta)
    mat = np.array([[a, -b], [b, a]], np.float32)
    t = np.array([10.0, 5.0], np.float32)
    src = (ARCFACE_TEMPLATE - t) @ np.linalg.inv(mat).T  # (5, 2)
    assert (src > 1).all() and (src < h - 2).all()

    out = np.asarray(warp_to_template(jnp.asarray(img), jnp.asarray(src)[None]))
    assert out.shape == (1, 112, 112, 3)
    for (dx, dy), (sx, sy) in zip(ARCFACE_TEMPLATE, src):
        # Bilinear-interpolate the warped output at the (fractional)
        # template coordinate and the source image at the src point:
        # for an affine image both equal the underlying linear form.
        ix, iy = int(dx), int(dy)
        fx, fy = dx - ix, dy - iy
        val = (
            out[0, iy, ix] * (1 - fx) * (1 - fy)
            + out[0, iy, ix + 1] * fx * (1 - fy)
            + out[0, iy + 1, ix] * (1 - fx) * fy
            + out[0, iy + 1, ix + 1] * fx * fy
        )
        want = np.array([sx / h, sy / h, (sx + sy) / (2 * h)], np.float32)
        np.testing.assert_allclose(val, want, rtol=1e-4, atol=1e-4)


def test_fan_five_points_layout():
    lm = np.zeros((2, 98, 2), np.float32)
    lm[:, 96] = [10, 20]
    lm[:, 60:68] = [10, 20]
    lm[:, 97] = [30, 20]
    lm[:, 68:76] = [30, 20]
    lm[:, 54] = [20, 30]
    lm[:, 76] = [12, 40]
    lm[:, 82] = [28, 40]
    pts = np.asarray(fan_five_points(jnp.asarray(lm)))
    np.testing.assert_allclose(
        pts[0], [[10, 20], [30, 20], [20, 30], [12, 40], [28, 40]], atol=1e-5
    )


@pytest.mark.slow
def test_aligned_embed_smoke():
    """End-to-end aligned embed: one traced program, unit-norm output."""
    from ppvision_tpu.models.fan import FAN

    model = IResNet(layers=LAYERS)
    params = arcface_variables_from_torch(_synthetic_iresnet_sd(), layers=LAYERS)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fan = FAN()
    fan_params = fan.init(jax.random.key(7), jnp.zeros((1, 256, 256, 3)))["params"]
    embed = jax.jit(make_aligned_embed_fn(model, params, fan, fan_params))
    x = jax.random.uniform(jax.random.key(8), (2, 128, 128, 3))
    e = np.asarray(embed(x))
    assert e.shape == (2, 512)
    assert np.isfinite(e).all()
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_fc_permutation_is_channel_consistent():
    """The fc importer must map torch's (C,H,W) flatten onto our (H,W,C)
    flatten: embedding of a torch-ordered identity probe must match."""
    sd = _synthetic_iresnet_sd()
    conv = arcface_variables_from_torch(sd, layers=LAYERS)
    w_t = sd["fc.weight"].reshape(512, 512, 7, 7)  # (E, C, H, W)
    k = np.asarray(conv["Dense_0"]["kernel"])  # (H*W*C, E)
    # spot-check a few positions: k[(h*7+w)*512+c, e] == w_t[e, c, h, w]
    rng = np.random.default_rng(3)
    for _ in range(20):
        e, c, h, w = rng.integers(0, (512, 512, 7, 7))
        assert k[(h * 7 + w) * 512 + c, e] == w_t[e, c, h, w]
