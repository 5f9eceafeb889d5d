"""Golden parity: JAX camera vs the PyTorch reference Camera.

BASELINE.json requires "identical PSFs within numerical tolerance".
The reference evaluates its multi-thousand-radian propagation chirps in
float32; we precompute them in float64, so small differences are
expected *and are in our favor*.  The tolerance budget below reflects
float32 chirp rounding in the reference, not model mismatch — the
self-consistency test (vs a float64 numpy replica of our own math) is
much tighter.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ppvision_tpu.optics import camera as cam

from .golden_reference import import_face_deid_camera

N = 256
TERMS = 64  # keep the test fast; term count doesn't change the math


@pytest.fixture(scope="module")
def pair():
    TorchCamera = import_face_deid_camera()
    torch.manual_seed(0)
    ref = TorchCamera(device="cpu", N=N, zernike_terms=TERMS)

    spec = cam.CameraSpec(n=N, zernike_terms=TERMS)
    consts = cam.make_camera_constants(spec)
    rng = np.random.default_rng(0)
    coeffs = rng.uniform(0, 1, size=(TERMS,)).astype(np.float32) / 100.0
    coeffs[:3] = 0.0

    with torch.no_grad():
        ref.Zer_no_train.copy_(torch.zeros(3, 1, 1))
        ref.Zer_train.copy_(torch.tensor(coeffs[3:]).reshape(-1, 1, 1))
    params = cam.CameraParams(
        zernike_train=jnp.asarray(coeffs[3:]), zernike_frozen=jnp.zeros(3)
    )
    return ref, spec, consts, params


def test_psf_matches_reference(pair):
    ref, spec, consts, params = pair
    with torch.no_grad():
        psf_ref = ref.get_psf()[0].numpy()  # (3, N, N)
    res = cam.compute_psf(params, consts)
    psf_jax = np.transpose(np.asarray(res.psf), (2, 0, 1))

    assert psf_jax.shape == psf_ref.shape
    np.testing.assert_allclose(psf_jax.sum(), 1.0, atol=1e-5)
    peak = psf_ref.max()
    # Max abs error within 0.5% of the PSF peak; energy placement identical.
    assert np.abs(psf_jax - psf_ref).max() < 5e-3 * peak
    # Correlation between the two PSFs should be essentially 1.
    corr = np.corrcoef(psf_jax.ravel(), psf_ref.ravel())[0, 1]
    assert corr > 0.99999


def test_psf_regularizers_match_reference(pair):
    ref, spec, consts, params = pair
    with torch.no_grad():
        ref.get_psf()
        loss_rad_ref = float(ref.loss_rad)
    res = cam.compute_psf(params, consts)
    np.testing.assert_allclose(float(res.loss_rad), loss_rad_ref, rtol=5e-2, atol=1e-7)


def test_sensor_image_matches_reference(pair):
    ref, spec, consts, params = pair
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, N, N, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(torch.tensor(np.transpose(img, (0, 3, 1, 2))))
        out_ref = np.transpose(out_ref.numpy(), (0, 2, 3, 1))
    out_jax, res = cam.camera_apply(params, consts, jnp.asarray(img))
    out_jax = np.asarray(out_jax)

    assert out_jax.shape == out_ref.shape
    assert np.abs(out_jax - out_ref).max() < 5e-3  # images are max-normalized to 1
    with torch.no_grad():
        centering_ref = float(ref.centering_loss)
    np.testing.assert_allclose(float(res.centering_loss), centering_ref, rtol=5e-2, atol=1e-10)


def test_jax_psf_is_float64_self_consistent(pair):
    """Our f32 device math vs an f64 numpy replica of the same equations."""
    _, spec, consts, params = pair
    res = cam.compute_psf(params, consts)
    psf32 = np.asarray(res.psf)

    # f64 replica using the same constants recomputed at full precision.
    import numpy as np64

    from ppvision_tpu.optics.camera import refractive_index_contrast
    from ppvision_tpu.optics.zernike import zernike_basis

    n = spec.n
    lam = np.asarray(spec.wavelengths, dtype=np.float64)[:, None, None]
    f = 1.0 / (1.0 / spec.zi + 1.0 / spec.z0)
    r_surf = f * refractive_index_contrast(np.float64(550e-9 * 1e6))
    f_lam = r_surf / refractive_index_contrast(lam * 1e6)
    k = 2 * np.pi / lam
    l_len, l_sen = spec.lens_extent, spec.sensor_extent
    du, dx2 = l_len / n, l_sen / n
    u = np.arange(-l_len / 2, l_len / 2, du)[:n]
    xx, yy = np.meshgrid(u, u, indexing="ij")
    xy = xx**2 + yy**2
    aperture = np.sqrt(xy) <= spec.aperture_radius
    fx = np.roll(np.arange(-1 / (2 * du), 1 / (2 * du), 1 / l_len)[:n], -(n // 2))
    fxx, fyy = np.meshgrid(fx, fx, indexing="ij")
    ff = fxx**2 + fyy**2
    x2 = np.arange(-l_sen / 2, l_sen / 2, dx2)[:n]
    sx, sy = np.meshgrid(x2, x2, indexing="ij")
    xy2 = sx**2 + sy**2

    basis = zernike_basis(spec.zernike_terms, n) * 1e-6
    coeffs = np.concatenate(
        [np.asarray(params.zernike_frozen), np.asarray(params.zernike_train)]
    ).astype(np.float64)
    height = np.einsum("t,thw->hw", coeffs, basis)
    phase = (
        -(k / (2 * f_lam)) * xy
        + (k / (2 * spec.scene_depth)) * xy
        + (np.pi / (lam * spec.zi * l_len)) * (l_len - l_sen) * xy
        + k * f_lam * height[None]
    )
    field = aperture * np.exp(1j * phase)
    # Coupled-wavelength DFT, matching the reference's dim-less fftn.
    field = np.fft.fftn(np.fft.fftshift(field, axes=(-2, -1)), axes=(0, 1, 2))
    field = field * np.exp(-1j * np.pi * lam * spec.zi * l_len / l_sen * ff)
    field = np.fft.ifftshift(np.fft.ifftn(field, axes=(0, 1, 2)), axes=(-2, -1))
    field = field * (l_sen / l_len) * (du**2 / dx2**2) * np.exp(
        -1j * (np.pi / (lam * spec.zi * l_sen)) * (l_len - l_sen) * xy2
    )
    psf64 = np.abs(field) ** 2
    psf64 = psf64 / psf64.sum()
    psf64 = np.transpose(psf64, (1, 2, 0))

    assert np.abs(psf32 - psf64).max() < 1e-4 * psf64.max()


def test_unaberrated_psf_is_airy_disk():
    """Reference-INDEPENDENT physics check (SURVEY §4 item 1): a flat
    (zero-Zernike) pupil focused on the sensor (scene_depth == z0, so
    the thin-lens design point is exactly in focus) must produce the
    closed-form Airy pattern — peak position, first-null radius
    r = 0.61 lambda zi / a, encircled energy 83.8%, and the full
    radial profile.  Catches propagation-math errors the golden
    tests would inherit from a shared misreading of the torch code."""
    import numpy as np
    from scipy.special import j1

    from ppvision_tpu.optics.camera import (
        CameraParams,
        CameraSpec,
        compute_psf,
        make_camera_constants,
    )

    spec = CameraSpec(
        n=256, zernike_terms=64, aperture_radius=0.5e-3,
        z0=5.0, scene_depth=5.0, wavelengths=(550e-9,),
        couple_wavelengths=False,
    )
    consts = make_camera_constants(spec)
    params = CameraParams(
        zernike_train=jnp.zeros(61), zernike_frozen=jnp.zeros(3)
    )
    psf = np.asarray(compute_psf(params, consts).psf)[:, :, 0]
    n = spec.n

    # 1. Diffraction peak dead-center.
    assert np.unravel_index(np.argmax(psf), psf.shape) == (n // 2, n // 2)

    yy, xx = np.mgrid[0:n, 0:n]
    r = np.sqrt((yy - n // 2) ** 2 + (xx - n // 2) ** 2)

    # 2. First null at 0.61 lambda zi / a = 9.04 px: the azimuthal mean
    # profile's first local minimum sits in the 9-px bin, >=100x below
    # the peak.
    prof = np.array(
        [psf[(r >= k - 0.5) & (r < k + 0.5)].mean() for k in range(16)]
    )
    null_px = 0.61 * 550e-9 * spec.zi / spec.aperture_radius / spec.pixel_pitch
    assert 8.5 < null_px < 9.5  # geometry sanity
    assert np.argmin(prof) == 9
    assert prof[9] < psf.max() / 100.0

    # 3. Encircled energy inside the first null: 83.8% for an ideal
    # circular aperture.
    ee = psf[r <= null_px].sum() / psf.sum()
    assert abs(ee - 0.838) < 0.01, ee

    # 4. Whole-core agreement with the closed-form Airy intensity.
    k0 = 2.0 * np.pi / 550e-9
    x = k0 * spec.aperture_radius * (r * spec.pixel_pitch) / spec.zi
    x = np.maximum(x, 1e-9)
    airy = (2.0 * j1(x) / x) ** 2
    m = r <= 20
    corr = np.corrcoef(psf[m], airy[m])[0, 1]
    assert corr > 0.999, corr
