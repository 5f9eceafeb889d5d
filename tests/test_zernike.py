"""Unit tests for the Zernike basis (vs analytic forms and orthonormality)."""

import numpy as np
import pytest

from ppvision_tpu.optics.zernike import (
    noll_to_nm,
    zernike_basis,
    zernike_nm,
    zernike_volume,
)


def test_noll_ordering_first_terms():
    # Canonical Noll table: piston, tip, tilt, defocus, astig, coma, ...
    expected = {
        1: (0, 0),
        2: (1, 1),
        3: (1, -1),
        4: (2, 0),
        5: (2, -2),
        6: (2, 2),
        7: (3, -1),
        8: (3, 1),
        9: (3, -3),
        10: (3, 3),
        11: (4, 0),
        12: (4, 2),
        13: (4, -2),
        14: (4, 4),
        15: (4, -4),
    }
    for j, nm in expected.items():
        assert noll_to_nm(j) == nm, f"j={j}"


def test_analytic_forms():
    rho = np.array([0.0, 0.5, 1.0])
    theta = np.array([0.0, np.pi / 3, np.pi / 2])
    # Piston = 1 everywhere.
    np.testing.assert_allclose(zernike_nm(0, 0, rho, theta), 1.0)
    # Defocus Z4 = sqrt(3) (2 rho^2 - 1).
    np.testing.assert_allclose(
        zernike_nm(2, 0, rho, theta), np.sqrt(3) * (2 * rho**2 - 1), atol=1e-12
    )
    # Tip Z2 = 2 rho cos(theta).
    np.testing.assert_allclose(
        zernike_nm(1, 1, rho, theta), 2 * rho * np.cos(theta), atol=1e-12
    )
    # Oblique astigmatism Z5 = sqrt(6) rho^2 sin(2 theta).
    np.testing.assert_allclose(
        zernike_nm(2, -2, rho, theta), np.sqrt(6) * rho**2 * np.sin(2 * theta), atol=1e-12
    )


def test_basis_orthonormal_on_disk():
    npix = 256
    basis = zernike_basis(15, npix)
    c = (npix - 1) / 2.0
    y, x = np.indices((npix, npix), dtype=np.float64)
    inside = np.hypot((y - c) / (npix / 2), (x - c) / (npix / 2)) <= 1.0
    area = inside.sum()
    gram = np.einsum("ahw,bhw->ab", basis * inside, basis * inside) / area
    # Pixelization limits accuracy; diagonal ~1, off-diagonal ~0.
    np.testing.assert_allclose(np.diag(gram), 1.0, atol=0.02)
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 0.02


def test_outside_is_zero_and_scale():
    basis = zernike_basis(4, 64)
    assert basis[1, 0, 0] == 0.0  # corner is outside the disk
    vol = zernike_volume(64, 4, use_disk_cache=False)
    assert vol.dtype == np.float32
    np.testing.assert_allclose(vol, basis.astype(np.float32) * 1e-6, rtol=1e-6)


def test_volume_disk_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("PPVISION_CACHE", str(tmp_path))
    zernike_volume.cache_clear()
    v1 = zernike_volume(32, 6)
    assert (tmp_path / "zernike_32_n6.npy").exists()
    zernike_volume.cache_clear()
    v2 = zernike_volume(32, 6)
    np.testing.assert_array_equal(v1, v2)
    zernike_volume.cache_clear()
