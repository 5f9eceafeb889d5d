"""Golden parity: JAX captioning lens vs the PyTorch reference OpticsZernike.

Reference is instantiated with ``height_tolerance=0`` so the
manufacturing-noise injection is deterministic zero on both sides.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ppvision_tpu.optics import lens as plens

from .golden_reference import import_caption_lens

TERMS = 64  # speed; same math as 350


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    OpticsZernike = import_caption_lens()

    # The reference caches zernike volumes into ./zernike_volumes of CWD,
    # and compares against torch.device(0), which raises on CPU-only
    # torch — map integer device args to CPU while instantiating.
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("lens_cache"))
    orig_device = torch.device

    def patched_device(*args, **kwargs):
        if args and isinstance(args[0], int):
            return orig_device("cpu")
        return orig_device(*args, **kwargs)

    torch.device = patched_device
    try:
        ref = OpticsZernike(
            input_shape=[None, 256, 256, 3],
            device=torch.device("cpu"),
            zernike_terms=TERMS,
            patch_size=256,
            height_tolerance=0.0,
            sensor_distance=0.025,
            wave_resolution=[896, 896],
            sample_interval=3e-6,
            upsample=False,
        )
    finally:
        torch.device = orig_device
        os.chdir(cwd)

    spec = plens.LensSpec(zernike_terms=TERMS, height_tolerance=0.0)
    consts = plens.make_lens_constants(spec)
    params = plens.init_lens_params(spec)
    return ref, spec, consts, params


@pytest.mark.slow
def test_lens_sensor_and_psf_match_reference(pair):
    ref, spec, consts, params = pair
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 256, 256, 3)).astype(np.float32)

    with torch.no_grad():
        sensor_t, psf_t, coeffs_t, loss_t = ref(
            torch.tensor(np.transpose(img, (0, 3, 1, 2))), None, "3"
        )
    sensor_ref = np.transpose(sensor_t.numpy(), (0, 2, 3, 1))
    psf_ref = psf_t[0].numpy()  # (256, 256, 3)

    res = plens.lens_apply(params, consts, spec, jnp.asarray(img), mask_mode="3")

    np.testing.assert_allclose(
        np.asarray(res.coeffs), coeffs_t.flatten().numpy(), atol=1e-6
    )
    # PSF parity: per-channel normalized; tolerance covers the
    # reference's float32 phase evaluation of ~1e5-radian chirps.
    psf_jax = np.asarray(res.psf)
    assert psf_jax.shape == psf_ref.shape
    peak = psf_ref.max()
    assert np.abs(psf_jax - psf_ref).max() < 2e-2 * peak
    corr = np.corrcoef(psf_jax.ravel(), psf_ref.ravel())[0, 1]
    assert corr > 0.999

    np.testing.assert_allclose(float(res.psf_loss), float(loss_t), rtol=5e-2)

    sensor_jax = np.asarray(res.sensor)
    assert sensor_jax.shape == sensor_ref.shape
    assert np.abs(sensor_jax - sensor_ref).max() < 2e-2  # max-normalized scale


@pytest.mark.slow
def test_lens_mask_modes(pair):
    ref, spec, consts, params = pair
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, 256, 256, 3)).astype(np.float32))

    res_none = plens.lens_apply(params, consts, spec, img, mask_mode=None)
    res_1 = plens.lens_apply(params, consts, spec, img, mask_mode="1")
    res_2 = plens.lens_apply(params, consts, spec, img, mask_mode="2")

    assert float(res_none.psf_loss) == 0.0
    assert float(res_1.psf_loss) > 0.0
    # Mode "2" crops the PSF outside the disk.
    outside = np.asarray(res_2.psf) * np.asarray(consts.mask_cut)
    assert np.abs(outside).max() == 0.0
    # Mode "1" leaves the PSF uncropped.
    np.testing.assert_allclose(np.asarray(res_1.psf), np.asarray(res_none.psf))


@pytest.mark.slow
def test_defocus_gradient_only():
    spec = plens.LensSpec(zernike_terms=16, wave_res=64, patch_size=32)
    consts = plens.make_lens_constants(spec)
    params = plens.init_lens_params(spec)
    img = jnp.ones((1, 32, 32, 3)) * 0.5

    def loss_fn(p):
        r = plens.lens_apply(p, consts, spec, img, mask_mode="3")
        return jnp.mean(r.sensor) + r.psf_loss

    g = jax.grad(loss_fn)(params)
    assert np.isfinite(float(g.defocus))
    assert float(jnp.abs(g.frozen_pre).max()) == 0.0
    assert float(jnp.abs(g.frozen_post).max()) == 0.0
