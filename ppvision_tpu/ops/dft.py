"""Fourier transforms for TPU: split-complex DFT-by-matmul on the MXU.

Two hard constraints shape this module:

1. The compute path of the whole framework is FFT convolution and FFT
   wave propagation (reference ``Face-DeId/Camera/Optics.py:100-107``,
   ``Image_Caption/Camera/Utils.py:328-378``).
2. The TPU backend used here implements **neither the FFT custom-call
   nor any complex64 op** — complex dtypes must never reach the device.

So transforms are expressed over *split-complex* values — a pair of
real float32 arrays ``(re, im)`` — and a 2-D DFT is two dense real
matmul pairs against precomputed cos/sin DFT matrices:

    F = C - iS,  C[j,k] = cos(2 pi j k / n),  S[j,k] = sin(2 pi j k / n)
    F (xr + i xi) = (C xr + S xi) + i (C xi - S xr)

which maps straight onto the 128x128 systolic array.  For the grid
sizes used here (128-1120 per side) this is the fast path on TPU even
where XLA FFT exists.  Matmuls run at ``Precision.HIGHEST`` so the
transform matches numpy FFT to ~1e-6 relative.

On CPU/GPU the same API dispatches to ``jnp.fft`` (packing to
complex64 and back), keeping golden-parity tests bit-comparable.
Override dispatch with ``PPVISION_FFT_IMPL={fft,dft}``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cmul",
    "cexp",
    "fft2_split",
    "fft1_split",
    "fft2_real",
    "ifft2_real_out",
    "fftshift_split",
    "ifftshift_split",
    "use_matmul_dft",
]

_PRECISION = jax.lax.Precision.HIGHEST

Split = tuple[jnp.ndarray, jnp.ndarray]


# ---------------------------------------------------------------------------
# Split-complex pointwise algebra (VPU ops).
# ---------------------------------------------------------------------------


def cmul(ar, ai, br, bi) -> Split:
    """(ar + i ai) * (br + i bi) as real ops."""
    return ar * br - ai * bi, ar * bi + ai * br


def cexp(phase) -> Split:
    """exp(i phase) as (cos, sin)."""
    return jnp.cos(phase), jnp.sin(phase)


# ---------------------------------------------------------------------------
# DFT matrices (host-precomputed float64 -> float32 cos/sin pairs).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _dft_cs_np(n: int, f64: bool = False) -> tuple[np.ndarray, np.ndarray]:
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * j * k / n
    dt = np.float64 if f64 else np.float32
    return np.cos(ang).astype(dt), np.sin(ang).astype(dt)


def _dft_cs(n: int, dtype=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    # float64 inputs get full-precision matrices (the f64 dynamics
    # goldens route through here under x64); everything else keeps f32.
    c, s = _dft_cs_np(n, dtype is not None and jnp.dtype(dtype) == jnp.float64)
    return jnp.asarray(c), jnp.asarray(s)


def use_matmul_dft() -> bool:
    """True when transforms must run as real matmuls (TPU or forced)."""
    impl = os.environ.get("PPVISION_FFT_IMPL", "auto")
    if impl == "dft":
        return True
    if impl == "fft":
        return False
    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")


# ---------------------------------------------------------------------------
# Matmul path.
# ---------------------------------------------------------------------------


def _apply_axis_mm(re, im, axis: int, inverse: bool) -> Split:
    """One DFT axis as real matmuls: contract ``axis`` with C +/- iS."""
    n = re.shape[axis]
    c, s = _dft_cs(n, re.dtype)
    re_m = jnp.moveaxis(re, axis, -1)
    im_m = jnp.moveaxis(im, axis, -1) if im is not None else None

    def mm(mat, x):
        return jnp.einsum("...n,Nn->...N", x, mat, precision=_PRECISION)

    if im_m is None:  # purely real input
        yr = mm(c, re_m)
        yi = -mm(s, re_m)
        if inverse:
            yi = -yi
    elif inverse:
        yr = mm(c, re_m) - mm(s, im_m)
        yi = mm(c, im_m) + mm(s, re_m)
    else:
        yr = mm(c, re_m) + mm(s, im_m)
        yi = mm(c, im_m) - mm(s, re_m)
    if inverse:
        yr = yr / n
        yi = yi / n
    return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)


# ---------------------------------------------------------------------------
# jnp.fft path (CPU/GPU).
# ---------------------------------------------------------------------------


def _pack(re, im):
    if im is None:
        # f64 reals pack to complex128 (f64 golden path); else complex64.
        cdt = jnp.complex128 if re.dtype == jnp.float64 else jnp.complex64
        return re.astype(cdt)
    return jax.lax.complex(re, im)


def _apply_fft(re, im, axes, inverse: bool) -> Split:
    z = _pack(re, im)
    z = jnp.fft.ifftn(z, axes=axes) if inverse else jnp.fft.fftn(z, axes=axes)
    return z.real, z.imag


# ---------------------------------------------------------------------------
# Public dispatched API.
# ---------------------------------------------------------------------------


def fft2_split(re, im, axes: tuple[int, int] = (-2, -1), inverse: bool = False) -> Split:
    """2-D (I)DFT of a split-complex array over ``axes``.

    ``im`` may be None for purely-real input.
    """
    if use_matmul_dft():
        a0, a1 = axes
        re, im = _apply_axis_mm(re, im, a0, inverse)
        return _apply_axis_mm(re, im, a1, inverse)
    return _apply_fft(re, im, axes, inverse)


def fft1_split(re, im, axis: int, inverse: bool = False) -> Split:
    """1-D (I)DFT along ``axis`` (e.g. the coupled-wavelength DFT)."""
    if use_matmul_dft():
        return _apply_axis_mm(re, im, axis, inverse)
    return _apply_fft(re, im, (axis,), inverse)


def fft2_real(x, axes: tuple[int, int] = (-2, -1)) -> Split:
    """2-D DFT of a real array (saves half the matmuls on the first axis)."""
    return fft2_split(x, None, axes)


def ifft2_real_out(re, im, axes: tuple[int, int] = (-2, -1)) -> jnp.ndarray:
    """Real part of the 2-D inverse DFT (for conv of real signals)."""
    yr, _ = fft2_split(re, im, axes, inverse=True)
    return yr


def fftshift_split(re, im, axes=(-2, -1)) -> Split:
    return jnp.fft.fftshift(re, axes=axes), jnp.fft.fftshift(im, axes=axes)


def ifftshift_split(re, im, axes=(-2, -1)) -> Split:
    return jnp.fft.ifftshift(re, axes=axes), jnp.fft.ifftshift(im, axes=axes)
