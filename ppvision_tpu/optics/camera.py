"""Face-DeId flavor learned-optics camera (two-step scaled-FFT propagation).

TPU-native re-design of the reference ``Camera`` module
(``Face-DeId/Camera/Optics.py:9-129``).  The physics is identical —
trainable Zernike phase mask on the lens aperture, two-step scaled-FFT
propagation from lens plane (extent ``L_len``) to sensor plane (extent
``L_sen``), PSF = field intensity, circular FFT convolution with the
image — but the implementation is built for XLA:

- **All static phase math is folded into constants.**  The lens/focus
  chirps, the scaled-FFT pre/mid/post chirps, and the aperture mask only
  depend on the (static) geometry, so they are evaluated host-side in
  float64 (where the multi-thousand-radian chirp phases need the
  precision) and baked into three complex64 tensors.  The only phase
  computed on device is the small (<<1 rad) trainable Zernike phase.
- **The height map is one MXU contraction**: ``coeffs @ basis`` as a
  ``(1, T) x (T, N*N)`` matmul instead of a broadcast-sum over T planes.
- **Wavelengths ride the channel axis** (NHWC), matching both the image
  layout and the TPU vector lane layout; the propagation is batched over
  wavelength with a leading axis.
- Everything is a pure function of a parameter pytree -> jit/vmap/grad
  compose; per-step losses (PSF energy-radius, centering) are returned,
  not stashed on a module.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.dft import cexp, cmul, fft1_split, fft2_split, fftshift_split, ifftshift_split
from .fourier import fft_conv2d_circular
from .zernike import zernike_volume

__all__ = [
    "CameraSpec",
    "CameraConstants",
    "CameraParams",
    "PsfResult",
    "make_camera_constants",
    "init_camera_params",
    "full_coeffs",
    "compute_psf",
    "camera_apply",
]


def refractive_index_contrast(wavelength_um: np.ndarray) -> np.ndarray:
    """Fused-silica-vs-air refractive index contrast |n_lens - n_air|.

    Sellmeier dispersion for the lens glass and Ciddor-style air index,
    as used by the reference's ``deta`` (``Face-DeId/Camera/
    Utils.py:33-40``).  Input wavelength in microns, float64.
    """
    lb2 = wavelength_um**2
    n_lens = np.sqrt(
        1.0
        + 0.6961663 * lb2 / (lb2 - 0.0684043**2)
        + 0.4079426 * lb2 / (lb2 - 0.1162414**2)
        + 0.8974794 * lb2 / (lb2 - 9.896161**2)
    )
    inv_lb2 = wavelength_um**-2.0
    n_air = 1.0 + 0.05792105 / (238.0185 - inv_lb2) + 0.00167917 / (57.362 - inv_lb2)
    return np.abs(n_lens - n_air)


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    """Static geometry of the privacy camera.

    Defaults reproduce the reference configuration
    (``Face-DeId/Camera/Optics.py:10-56``): N=256 grid, 2 mm aperture
    radius, 50 mm lens-sensor distance, focal length designed for a 5 m
    object at 550 nm, mirrorless-sensor 3.713 um pixels, subject at
    0.75 m, RGB design wavelengths 640/550/440 nm.
    """

    n: int = 256
    zernike_terms: int = 300
    n_frozen: int = 3
    aperture_radius: float = 2.0e-3
    zi: float = 50e-3
    z0: float = 5.0
    pixel_pitch: float = 3.713103e-6
    scene_depth: float = 0.75
    wavelengths: tuple[float, ...] = (640e-9, 550e-9, 440e-9)
    mask_radius_px: int = 32
    # The reference propagates with torch.fft.fftn/ifftn *without a dim
    # argument* (``Face-DeId/Camera/Optics.py:101-105``), which also runs a
    # length-3 DFT across the wavelength axis and cross-mixes the RGB
    # fields.  That coupled behavior is what its published checkpoints
    # were trained with, so parity mode keeps it; set False for the
    # physically-independent per-wavelength propagation.
    couple_wavelengths: bool = True

    @property
    def lens_extent(self) -> float:
        return 4.0 * self.aperture_radius

    @property
    def sensor_extent(self) -> float:
        return self.pixel_pitch * self.n


@struct.dataclass
class CameraConstants:
    """Device-resident static tensors.

    Chirps are precomputed host-side in float64 (their phases reach 1e5
    radians, far beyond float32 resolution) and stored as split-complex
    (re, im) float32 pairs — the TPU backend has no complex dtype.
    """

    zernike_basis: jnp.ndarray  # (T, N*N) float32, height-map units (1e-6 m)
    phase_scale: jnp.ndarray  # (C, 1, 1) float32: k * f_lambda per wavelength
    chirp_pre: tuple  # (re, im) of (C, N, N): aperture * lens * focus * pre-chirp
    chirp_freq: tuple  # (re, im) of (C, N, N): scaled-FFT frequency chirp
    chirp_post: tuple  # (re, im) of (C, N, N): post-chirp * amplitude scale
    rho_mask: jnp.ndarray  # (N, N) float32: 1 outside mask_radius_px on sensor
    # Static (non-pytree) so jitted callers can branch on it at trace time.
    couple_wavelengths: bool = struct.field(pytree_node=False, default=True)


class CameraParams(NamedTuple):
    """Trainable state: the non-frozen Zernike coefficients."""

    zernike_train: jnp.ndarray  # (T - n_frozen,) float32
    zernike_frozen: jnp.ndarray  # (n_frozen,) float32, kept for checkpoints


class PsfResult(NamedTuple):
    psf: jnp.ndarray  # (N, N, C) float32, sums to 1 over all entries
    loss_rad: jnp.ndarray  # scalar: Frobenius norm of PSF energy outside radius
    centering_loss: jnp.ndarray  # scalar: half-period shift symmetry penalty


def make_camera_constants(spec: CameraSpec) -> CameraConstants:
    """Precompute every static tensor of the optical model (host, f64)."""
    n = spec.n
    lam = np.asarray(spec.wavelengths, dtype=np.float64)[:, None, None]  # (C,1,1)
    # Focal length from the thin-lens design point, and the lens "R"
    # (surface curvature proxy) at the 550 nm design wavelength.
    f = 1.0 / (1.0 / spec.zi + 1.0 / spec.z0)
    r_surf = f * refractive_index_contrast(np.float64(550e-9 * 1e6))
    f_lam = r_surf / refractive_index_contrast(lam * 1e6)  # per-wavelength focal len
    k = 2.0 * np.pi / lam

    l_len = spec.lens_extent
    l_sen = spec.sensor_extent
    du = l_len / n
    dx2 = l_sen / n

    u = np.arange(-l_len / 2.0, l_len / 2.0, du, dtype=np.float64)[:n]
    xx, yy = np.meshgrid(u, u, indexing="ij")
    xy = xx * xx + yy * yy
    aperture = (np.sqrt(xy) <= spec.aperture_radius).astype(np.float64)

    fx = np.arange(-1.0 / (2.0 * du), 1.0 / (2.0 * du), 1.0 / l_len, dtype=np.float64)[:n]
    fx = np.roll(fx, -(n // 2))  # fftshift to corner-origin frequency order
    fxx, fyy = np.meshgrid(fx, fx, indexing="ij")
    ff = fxx * fxx + fyy * fyy

    x2 = np.arange(-l_sen / 2.0, l_sen / 2.0, dx2, dtype=np.float64)[:n]
    sx, sy = np.meshgrid(x2, x2, indexing="ij")
    xy2 = sx * sx + sy * sy
    rho_mask = (np.sqrt(xy2) > spec.pixel_pitch * spec.mask_radius_px).astype(np.float32)

    # Static phases (f64): lens transmission, object-distance focus term,
    # and the three chirps of the two-step scaled-FFT propagator
    # (pre-chirp in the lens plane, frequency-domain chirp, post-chirp in
    # the sensor plane with the L_sen/L_len amplitude rescale).
    phase_pre = (
        -(k / (2.0 * f_lam)) * xy
        + (k / (2.0 * spec.scene_depth)) * xy
        + (np.pi / (lam * spec.zi * l_len)) * (l_len - l_sen) * xy
    )
    chirp_pre = aperture * np.exp(1j * phase_pre)
    chirp_freq = np.exp(-1j * (np.pi * lam * spec.zi * l_len / l_sen) * ff)
    amp = (l_sen / l_len) * (du * du) / (dx2 * dx2)
    chirp_post = amp * np.exp(-1j * (np.pi / (lam * spec.zi * l_sen)) * (l_len - l_sen) * xy2)

    basis = zernike_volume(n, spec.zernike_terms).reshape(spec.zernike_terms, n * n)

    def split(z):
        return (
            jnp.asarray(z.real, dtype=jnp.float32),
            jnp.asarray(z.imag, dtype=jnp.float32),
        )

    return CameraConstants(
        zernike_basis=jnp.asarray(basis, dtype=jnp.float32),
        phase_scale=jnp.asarray(k * f_lam, dtype=jnp.float32),
        chirp_pre=split(chirp_pre),
        chirp_freq=split(chirp_freq),
        chirp_post=split(chirp_post),
        rho_mask=jnp.asarray(rho_mask),
        couple_wavelengths=spec.couple_wavelengths,
    )


def init_camera_params(key: jax.Array, spec: CameraSpec) -> CameraParams:
    """Random init: U[0, 1)/100 per coefficient, first ``n_frozen`` zeroed.

    Matches the reference init (``Face-DeId/Camera/Optics.py:59-62``).
    """
    inits = jax.random.uniform(key, (spec.zernike_terms,), dtype=jnp.float32) / 100.0
    return CameraParams(
        zernike_train=inits[spec.n_frozen :],
        zernike_frozen=jnp.zeros((spec.n_frozen,), dtype=jnp.float32),
    )


def full_coeffs(params: CameraParams) -> jnp.ndarray:
    """Full (T,) coefficient vector with the frozen head stop-gradiented."""
    return jnp.concatenate(
        [jax.lax.stop_gradient(params.zernike_frozen), params.zernike_train]
    )


def compute_psf(params: CameraParams, consts: CameraConstants) -> PsfResult:
    """Trainable-phase -> PSF, plus the PSF regularizer losses.

    The two FFTs per wavelength are the only non-pointwise work; XLA
    fuses the complex multiplies around them.
    """
    n = consts.rho_mask.shape[-1]
    coeffs = full_coeffs(params)
    # (1, T) @ (T, N*N) on the MXU -> (N, N) height map.
    height_map = (coeffs[None, :] @ consts.zernike_basis).reshape(n, n)
    phase = consts.phase_scale * height_map[None]  # (C, N, N), small dynamic phase
    mr, mi = cexp(phase)

    fr, fi = cmul(consts.chirp_pre[0], consts.chirp_pre[1], mr, mi)
    fr, fi = fftshift_split(fr, fi, axes=(-2, -1))
    fr, fi = fft2_split(fr, fi, axes=(1, 2))
    if consts.couple_wavelengths:
        fr, fi = fft1_split(fr, fi, axis=0)
    fr, fi = cmul(fr, fi, consts.chirp_freq[0], consts.chirp_freq[1])
    if consts.couple_wavelengths:
        fr, fi = fft1_split(fr, fi, axis=0, inverse=True)
    fr, fi = fft2_split(fr, fi, axes=(1, 2), inverse=True)
    fr, fi = ifftshift_split(fr, fi, axes=(-2, -1))
    fr, fi = cmul(fr, fi, consts.chirp_post[0], consts.chirp_post[1])

    psf = fr * fr + fi * fi  # (C, N, N) field intensity
    psf = psf / jnp.sum(psf)  # joint normalization over wavelengths, as reference
    loss_rad = jnp.linalg.norm(consts.rho_mask[None] * psf)

    centering = jnp.mean(jnp.square(psf - jnp.roll(psf, n // 2, axis=-2)))
    centering = centering + jnp.mean(jnp.square(psf - jnp.roll(psf, n // 2, axis=-1)))

    psf_hwc = jnp.transpose(psf, (1, 2, 0))  # -> (N, N, C)
    return PsfResult(psf=psf_hwc, loss_rad=loss_rad, centering_loss=centering)


def camera_apply(
    params: CameraParams, consts: CameraConstants, img: jnp.ndarray
) -> tuple[jnp.ndarray, PsfResult]:
    """Form the privacy-preserved sensor image from an NHWC batch in [0, 1].

    Pipeline (reference ``Face-DeId/Camera/Optics.py:122-129``): PSF ->
    roll center to corner -> circular FFT conv -> per-image max
    normalization.  Returns (sensor image, PsfResult).
    """
    res = compute_psf(params, consts)
    n = res.psf.shape[0]
    kernel = jnp.roll(res.psf, shift=(-(n // 2), -(n // 2)), axis=(0, 1))
    sensor = fft_conv2d_circular(img, kernel)
    peak = jnp.max(sensor, axis=(1, 2, 3), keepdims=True)
    sensor = sensor / peak
    return sensor, res
