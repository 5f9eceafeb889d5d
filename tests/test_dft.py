"""Split-complex matmul-DFT vs numpy FFT: the TPU path must match."""

import numpy as np
import pytest

from ppvision_tpu.ops import dft


def _rand_split(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(shape).astype(np.float32),
        rng.standard_normal(shape).astype(np.float32),
    )


@pytest.mark.parametrize("impl", ["dft", "fft"])
@pytest.mark.parametrize("shape,axes", [((3, 64, 64), (-2, -1)), ((2, 33, 65), (1, 2))])
def test_fft2_split_matches_numpy(impl, shape, axes, monkeypatch):
    monkeypatch.setenv("PPVISION_FFT_IMPL", impl)
    re, im = _rand_split(shape)
    gr, gi = dft.fft2_split(re, im, axes=axes)
    want = np.fft.fft2(re + 1j * im, axes=axes)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(gr), want.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(gi), want.imag, atol=3e-5 * scale)


@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_inverse_roundtrip(impl, monkeypatch):
    monkeypatch.setenv("PPVISION_FFT_IMPL", impl)
    re, im = _rand_split((4, 32, 48), seed=1)
    fr, fi = dft.fft2_split(re, im)
    br, bi = dft.fft2_split(fr, fi, inverse=True)
    np.testing.assert_allclose(np.asarray(br), re, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bi), im, atol=1e-4)


@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_real_input_and_real_out(impl, monkeypatch):
    monkeypatch.setenv("PPVISION_FFT_IMPL", impl)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16)).astype(np.float32)
    fr, fi = dft.fft2_real(x)
    want = np.fft.fft2(x)
    np.testing.assert_allclose(np.asarray(fr), want.real, atol=1e-4 * np.abs(want).max())
    np.testing.assert_allclose(np.asarray(fi), want.imag, atol=1e-4 * np.abs(want).max())
    back = dft.ifft2_real_out(fr, fi)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


@pytest.mark.parametrize("impl", ["dft", "fft"])
def test_fft1_split_matches_numpy(impl, monkeypatch):
    monkeypatch.setenv("PPVISION_FFT_IMPL", impl)
    re, im = _rand_split((3, 16, 16), seed=3)
    gr, gi = dft.fft1_split(re, im, axis=0)
    want = np.fft.fft(re + 1j * im, axis=0)
    np.testing.assert_allclose(np.asarray(gr), want.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gi), want.imag, atol=1e-4)
    br, bi = dft.fft1_split(gr, gi, axis=0, inverse=True)
    np.testing.assert_allclose(np.asarray(br), re, atol=1e-4)


@pytest.mark.slow
def test_forced_dft_camera_matches_fft_path(monkeypatch):
    """The camera must produce the same image through either transform."""
    import jax
    import jax.numpy as jnp

    from ppvision_tpu.optics import camera as cam

    spec = cam.CameraSpec(n=64, zernike_terms=16)
    consts = cam.make_camera_constants(spec)
    params = cam.init_camera_params(jax.random.key(0), spec)
    img = np.random.default_rng(3).uniform(size=(2, 64, 64, 3)).astype(np.float32)

    monkeypatch.setenv("PPVISION_FFT_IMPL", "fft")
    out_fft, res_fft = cam.camera_apply(params, consts, jnp.asarray(img))
    monkeypatch.setenv("PPVISION_FFT_IMPL", "dft")
    out_dft, res_dft = cam.camera_apply(params, consts, jnp.asarray(img))

    np.testing.assert_allclose(np.asarray(out_dft), np.asarray(out_fft), atol=5e-4)
    np.testing.assert_allclose(
        float(res_dft.loss_rad), float(res_fft.loss_rad), rtol=1e-3, atol=1e-6
    )
