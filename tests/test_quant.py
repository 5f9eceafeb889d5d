"""Int8 quantized decode (opt-in serving mode, ops/quant.py).

Verifies the three contracts of the mode:
1. the int8 conv ops approximate their exact counterparts to the
   expected dynamic-quantization error (and are EXACT when values are
   int8-representable);
2. ``Generator(quant_decode=True)`` owns the IDENTICAL param tree, so
   checkpoints and torch imports need no conversion;
3. the end-to-end quantized decode tracks the exact decode closely.

No reference counterpart (the reference serves f32 only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.models.stargan import Generator
from ppvision_tpu.ops.fusedconv import conv3x3_nearest_up2x
from ppvision_tpu.ops.quant import (
    int8_conv,
    int8_conv3x3_nearest_up2x,
    quantize_dynamic,
    quantize_weight_per_oc,
)


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


def test_int8_conv_close_to_f32():
    k = jax.random.normal(jax.random.key(0), (3, 3, 16, 32))
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    y8 = int8_conv(x, k)
    yf = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert _rel(y8, yf) < 0.03


def test_int8_upconv_close_to_f32():
    k = jax.random.normal(jax.random.key(0), (3, 3, 16, 32))
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    u8 = int8_conv3x3_nearest_up2x(x, k)
    uf = conv3x3_nearest_up2x(x, k)
    assert u8.shape == uf.shape == (2, 16, 16, 32)
    assert _rel(u8, uf) < 0.03


def test_int8_conv_exact_on_representable_values():
    """Integer-valued inputs/weights within +-127 quantize losslessly,
    so the int8 conv must be bit-exact there (isolates the rounding as
    the ONLY approximation)."""
    rng = np.random.default_rng(0)
    k = rng.integers(-127, 128, (3, 3, 8, 8)).astype(np.float32)
    x = rng.integers(-127, 128, (1, 6, 6, 8)).astype(np.float32)
    # Pin each quantization scale to exactly 1 (abs-max == 127): the
    # per-output-channel weight scale and the per-tensor activation
    # scale then map every integer value to itself.
    k[0, 0, 0, :] = 127.0
    x[0, 0, 0, 0] = 127.0
    k, x = jnp.asarray(k), jnp.asarray(x)
    y8 = int8_conv(x, k)
    yf = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(y8), np.asarray(yf), rtol=1e-6)


def test_quantizers_roundtrip():
    x = jax.random.normal(jax.random.key(0), (4, 5, 6, 7)) * 3.0
    xq, sx = quantize_dynamic(x)
    assert xq.dtype == jnp.int8 and sx.shape == (4, 1, 1, 1)
    assert _rel(xq.astype(jnp.float32) * sx, x) < 0.01
    _, sx_t = quantize_dynamic(x, per_sample=False)
    assert sx_t.shape == ()
    k = jax.random.normal(jax.random.key(1), (3, 3, 4, 9))
    kq, sk = quantize_weight_per_oc(k)
    assert kq.dtype == jnp.int8 and sk.shape == (9,)
    assert _rel(kq.astype(jnp.float32) * sk, k) < 0.01


@pytest.fixture(scope="module")
def small_gens():
    kwargs = dict(img_size=32, style_dim=8, max_conv_dim=64, w_hpf=1.0)
    exact = Generator(**kwargs)
    quant = Generator(**kwargs, quant_decode=True)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    s = jax.random.normal(jax.random.key(1), (2, 8))
    masks = (
        jax.random.uniform(jax.random.key(2), (2, 32, 32, 1)),
        jax.random.uniform(jax.random.key(3), (2, 32, 32, 1)),
    )
    params = exact.init(jax.random.key(4), x, s, masks)["params"]
    return exact, quant, params, x, s, masks


@pytest.mark.slow  # traces the full quant Generator init (~1min on CPU)
def test_quant_decode_param_tree_identical(small_gens):
    exact, quant, params, x, s, masks = small_gens
    qparams = quant.init(jax.random.key(4), x, s, masks)["params"]
    ref = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype.name), params)
    got = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype.name), qparams)
    assert ref == got


@pytest.mark.slow  # compiles exact + quant decode graphs (~1min on CPU)
def test_quant_decode_tracks_exact_decode(small_gens):
    exact, quant, params, x, s, masks = small_gens
    ye = exact.apply({"params": params}, x, s, masks)
    yq = quant.apply({"params": params}, x, s, masks)
    assert yq.shape == ye.shape and yq.dtype == ye.dtype
    # Dynamic int8 over ~6 quantized convs: each contributes ~1% rel
    # error; instance norms between them renormalize, so accumulation
    # stays mild.  The bound is loose on purpose (random params are the
    # worst case — no trained structure to absorb rounding).
    assert _rel(yq, ye) < 0.25
    # And it must actually be a different computation (quant active).
    assert _rel(yq, ye) > 1e-5


@pytest.mark.slow  # compiles the full tiny de-id pipeline twice
def test_quant_deid_multi_style_tracks_exact():
    """Int8 decode under the scan-over-styles serving path
    (deid.deid_multi_style) — the exact formulation bench_int8.py runs
    on chip."""
    import dataclasses

    from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
    from ppvision_tpu.deid import build_deid, deid_multi_style

    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=64, style_dim=16, latent_dim=8,
                          max_conv_dim=64, fan_input_size=64),
        camera=CameraConfig(n=32),
    )
    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quant_decode=True)
    )
    bundle = build_deid(jax.random.key(0), cfg)
    qbundle = build_deid(jax.random.key(0), qcfg)._replace(params=bundle.params)
    xs = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    xr = jax.random.uniform(jax.random.key(2), (3, 64, 64, 3))
    yr = jnp.zeros((3,), jnp.int32)
    ye = deid_multi_style(bundle, bundle.params, xs, xr, yr)
    yq = deid_multi_style(qbundle, qbundle.params, xs, xr, yr)
    assert yq.shape == ye.shape == (3, 2, 64, 64, 3)
    assert np.isfinite(np.asarray(yq)).all()
    assert 1e-5 < _rel(yq, ye) < 0.25
