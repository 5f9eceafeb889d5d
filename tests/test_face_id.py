"""Face-ID embedding net: structure, importer mapping, cosine metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.metrics.face_id import (
    IResNet,
    arcface_variables_from_torch,
    face_id_cosine,
    make_embed_fn,
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
