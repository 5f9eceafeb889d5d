"""Shape and gradient smoke tests for the StarGAN-v2 zoo and FAN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.models import fan as fan_mod
from ppvision_tpu.models.stargan import (
    Discriminator,
    Generator,
    MappingNetwork,
    StyleEncoder,
)

IMG = 128  # keep CPU tests fast; 256 exercised on TPU drives


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.key(0), 8)


@pytest.mark.slow
def test_generator_shapes(keys):
    g = Generator(img_size=IMG, style_dim=64, w_hpf=1.0)
    x = jnp.zeros((2, IMG, IMG, 3))
    s = jnp.zeros((2, 64))
    masks = (jnp.zeros((2, 256, 256, 1)), jnp.zeros((2, 256, 256, 1)))
    params = g.init(keys[0], x, s, masks)
    y = g.apply(params, x, s, masks)
    assert y.shape == (2, IMG, IMG, 3)
    # Without masks the skip path is off but shapes hold.
    y2 = g.apply(params, x, s, None)
    assert y2.shape == (2, IMG, IMG, 3)


@pytest.mark.slow
def test_generator_whpf0_uses_shortcuts(keys):
    g = Generator(img_size=64, style_dim=16, w_hpf=0.0)
    x = jnp.ones((1, 64, 64, 3))
    s = jnp.ones((1, 16))
    params = g.init(keys[1], x, s, None)
    assert np.isfinite(np.asarray(g.apply(params, x, s, None))).all()


@pytest.mark.slow
def test_mapping_and_style_select_domain(keys):
    m = MappingNetwork(latent_dim=16, style_dim=64, num_domains=3)
    z = jax.random.normal(keys[2], (4, 16))
    y = jnp.asarray([0, 1, 2, 1])
    params = m.init(keys[3], z, y)
    s = m.apply(params, z, y)
    assert s.shape == (4, 64)
    # Same z, different domain -> different style.
    s0 = m.apply(params, z, jnp.zeros(4, dtype=jnp.int32))
    s2 = m.apply(params, z, 2 * jnp.ones(4, dtype=jnp.int32))
    assert np.abs(np.asarray(s0) - np.asarray(s2)).max() > 1e-6

    e = StyleEncoder(img_size=IMG, style_dim=64, num_domains=2)
    x = jax.random.normal(keys[4], (2, IMG, IMG, 3))
    ye = jnp.asarray([0, 1])
    pe = e.init(keys[5], x, ye)
    se = e.apply(pe, x, ye)
    assert se.shape == (2, 64)


@pytest.mark.slow
def test_discriminator_logits(keys):
    d = Discriminator(img_size=IMG, num_domains=2)
    x = jax.random.normal(keys[6], (2, IMG, IMG, 3))
    y = jnp.asarray([0, 1])
    params = d.init(keys[7], x, y)
    out = d.apply(params, x, y)
    assert out.shape == (2,)

    def loss(p):
        return jnp.mean(d.apply(p, x, y) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_fan_forward_and_heatmaps():
    f = fan_mod.FAN()
    x = jnp.zeros((1, 256, 256, 3))
    params = f.init(jax.random.key(0), x)["params"]
    out = f.apply({"params": params}, x)
    assert out.shape == (1, 64, 64, 99)

    img = jax.random.uniform(jax.random.key(1), (1, 256, 256, 3))
    m1, m2 = fan_mod.get_heatmap(f, params, img, privacy=True)
    assert m1.shape == (1, 256, 256, 1) and m2.shape == (1, 256, 256, 1)
    assert float(m1.max()) <= 1.0 and float(m1.min()) >= 0.0

    p1, p2 = fan_mod.get_heatmap(f, params, img, privacy=False)
    assert p1.shape == (1, 256, 256, 1) and p2.shape == (1, 256, 256, 1)

    d1, _ = fan_mod.get_heatmap(f, params, img, delimiter=True)
    assert d1.shape == (1, 256, 256, 1)

    lm = fan_mod.estimate_landmarks(f, params, img)
    assert lm.shape == (1, 98, 2)


def test_dense_block_pool_output_matches_pool_after():
    """pool_output=True must equal avg_pool_2x(block(x)): the pool is
    commuted through the concat/residual and fused into the last conv —
    exact linear algebra, so f32 agrees to reassociation rounding."""
    from ppvision_tpu.ops.image import avg_pool_2x

    for cin, cout in [(64, 128), (128, 128)]:
        blk = fan_mod.DenseConvBlock(cin, cout)
        blk_p = fan_mod.DenseConvBlock(cin, cout, pool_output=True)
        x = jax.random.normal(jax.random.key(2), (2, 16, 16, cin), jnp.float32)
        params = blk.init(jax.random.key(3), x)["params"]
        # Same param tree for both compute paths.
        assert set(params.keys()) == set(blk_p.init(jax.random.key(3), x)["params"].keys())
        want = avg_pool_2x(blk.apply({"params": params}, x))
        got = blk_p.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_fan_privacy_fold_matches_channel_sums():
    """fold_privacy_head must equal the f32 channel-sums of the
    99-channel head output (the kernel fold is the same linear map)."""
    f = fan_mod.FAN()
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    params = f.init(jax.random.key(5), x)["params"]
    hm = f.apply({"params": params}, x)[..., : fan_mod.NUM_LANDMARKS]
    want1 = jnp.sum(hm[..., :49], axis=-1, keepdims=True, dtype=jnp.float32)
    want2 = jnp.sum(hm[..., 49:], axis=-1, keepdims=True, dtype=jnp.float32)
    got = fan_mod.FAN(fold_privacy_head=True).apply({"params": params}, x)
    assert got.shape == want1.shape[:-1] + (2,)
    np.testing.assert_allclose(np.asarray(got[..., :1]), np.asarray(want1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[..., 1:]), np.asarray(want2), rtol=1e-5, atol=1e-5)


def test_preprocess_shift_is_circular_roll():
    """shift(x, N) must equal a circular roll of rows by -N."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 8, 4, 98)).astype(np.float32))
    rolled = fan_mod._roll_rows(x, 3)
    np.testing.assert_allclose(np.asarray(rolled), np.roll(np.asarray(x), -3, axis=1))


@pytest.mark.slow
def test_generator_multistyle_matches_tiled(keys):
    """The encode-once multi-style path must match per-style tiled calls
    exactly (it is the same math; only the encoder is shared)."""
    from ppvision_tpu.models.stargan import Generator

    img, style_dim, b, r = 32, 8, 2, 3
    gen = Generator(img_size=img, style_dim=style_dim, max_conv_dim=32)
    x = jax.random.uniform(jax.random.key(1), (b, img, img, 3))
    masks = (
        jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
        jax.random.uniform(jax.random.key(3), (b, 256, 256, 1)),
    )
    styles = jax.random.normal(jax.random.key(4), (r, style_dim))
    params = gen.init(jax.random.key(0), x, jnp.zeros((b, style_dim)), masks)["params"]

    ss = jnp.repeat(styles, b, axis=0)  # r blocks of b
    multi = gen.apply({"params": params}, x, ss, masks)  # (r*b, ...)
    assert multi.shape[0] == r * b

    for i in range(r):
        s_i = jnp.broadcast_to(styles[i : i + 1], (b, style_dim))
        single = gen.apply({"params": params}, x, s_i, masks)
        np.testing.assert_allclose(
            np.asarray(multi[i * b : (i + 1) * b]), np.asarray(single),
            rtol=2e-2, atol=2e-2,  # bf16 compute dtype default is off; f32 here
        )

    # Mismatched style batch is rejected loudly.
    with pytest.raises(ValueError, match="multiple"):
        gen.apply({"params": params}, x, jnp.zeros((b + 1, style_dim)), masks)


@pytest.mark.slow  # ~67 s on 1 CPU: compiles both decode formulations
def test_deid_multi_style_matches_flat_generator():
    """The scan-over-styles decode (deid.deid_multi_style) must match the
    flat R*B multi-style Generator.__call__ path."""
    import numpy as np

    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_from_reference, deid_multi_style

    cfg = FaceDeIdConfig(model=ModelConfig(img_size=64, style_dim=16, latent_dim=8,
                                           max_conv_dim=64),
                         camera=CameraConfig(n=32))
    bundle = build_deid(jax.random.key(0), cfg)
    b, r = 2, 3
    xs = jax.random.uniform(jax.random.key(1), (b, 64, 64, 3))
    xr = jax.random.uniform(jax.random.key(2), (r, 64, 64, 3))
    yr = jnp.zeros((r,), jnp.int32)

    fakes = deid_multi_style(bundle, bundle.params, xs, xr, yr)
    assert fakes.shape == (r, b, 64, 64, 3)
    # Flat path, one style at a time (exact reference semantics).
    for i in range(r):
        want = deid_from_reference(
            bundle, bundle.params, xs, jnp.tile(xr[i][None], (b, 1, 1, 1)), yr[i] * jnp.ones((b,), jnp.int32)
        )
        # Both paths run the bf16 pipeline with different batch tilings,
        # so outputs can differ by ~1 bf16 ulp at any magnitude: rtol
        # 2^-6 (2 ulp) covers large values the flat atol would reject.
        np.testing.assert_allclose(
            np.asarray(fakes[i]), np.asarray(want), rtol=2 ** -6, atol=5e-2
        )
