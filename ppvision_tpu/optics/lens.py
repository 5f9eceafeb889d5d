"""Image-captioning flavor learned-optics camera (Fresnel propagation).

TPU-native re-design of the reference ``OpticsZernike`` module
(``Image_Caption/Camera/Lens.py:11-339`` plus the propagation helpers in
``Image_Caption/Camera/Utils.py``).  Physics: a spherical wavefront from
a finite-depth point source passes a trainable Zernike phase plate
(only the defocus coefficient trains; init -22) and a circular
aperture, Fresnel-propagates 25 mm to the sensor through a 1/4-padded
transfer function, the intensity PSF is area-downsampled 896 -> 256 and
per-channel normalized, optionally masked to / penalized on a central
32 px disk, and finally linearly FFT-convolved with the image.

TPU-first structure mirrors :mod:`.camera`:

- Static phases (spherical wavefront, Fresnel kernel — both reach 1e5
  radians) are evaluated host-side in float64 and folded into
  split-complex float32 constants.
- The height map is one MXU contraction; transforms are matmul-DFTs
  (:mod:`ppvision_tpu.ops.dft`), so no complex dtype or FFT custom-call
  is needed on device.
- Manufacturing-noise injection (the reference's ``PhasePlate``
  height tolerance, ``Image_Caption/Camera/Utils.py:397-406``) is
  explicit: pass a PRNG key to enable it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.dft import cexp, cmul, fft2_split
from .fourier import fft_conv2d_linear
from .zernike import zernike_volume

__all__ = [
    "LensSpec",
    "LensConstants",
    "LensParams",
    "LensResult",
    "make_lens_constants",
    "init_lens_params",
    "lens_coeffs",
    "lens_psf",
    "lens_apply",
]


@dataclasses.dataclass(frozen=True)
class LensSpec:
    """Static geometry; defaults reproduce the reference configuration
    (``Image_Caption/train.py:64-66``: 896^2 wave grid, 256^2 sensor,
    3 um sampling, 25 mm sensor distance, 350 Zernike terms)."""

    wave_res: int = 896
    patch_size: int = 256
    zernike_terms: int = 350
    sensor_distance: float = 25e-3
    sample_interval: float = 3e-6
    wavelengths: tuple[float, ...] = (460e-9, 550e-9, 640e-9)
    refractive_idcs: tuple[float, ...] = (1.499, 1.493, 1.488)
    height_tolerance: float = 2e-8
    depth: float = 0.5  # 1/diopters: reference optics_cfg=1 -> 1/2
    defocus_init: float = -22.0
    mask_radius_px: int = 32

    @property
    def physical_size(self) -> float:
        return self.wave_res * self.sample_interval

    @property
    def pad(self) -> int:
        return self.wave_res // 4


@struct.dataclass
class LensConstants:
    """Device-resident static tensors (phases precomputed in f64).

    Only the defocus coefficient trains, so the device never sees the
    full (T, N, N) Zernike volume (1.1 GB at 350x896^2): the frozen
    coefficients' contribution is folded into ``height_base`` host-side
    and the trainable direction is the single ``defocus_plane``.
    """

    height_base: jnp.ndarray  # (N, N) f32: sum of frozen coeffs x basis
    defocus_plane: jnp.ndarray  # (N, N) f32: Noll j=4 basis plane
    phase_scale: jnp.ndarray  # (C,) f32: wave_nos * (n_lens - 1) per channel
    static_pre: tuple  # (re, im) of (N, N, C): aperture * spherical wavefront
    fresnel_h: tuple  # (re, im) of (M, M, C): padded transfer function
    mask_keep: jnp.ndarray  # (P, P, 1) f32: 1 inside the central disk
    mask_cut: jnp.ndarray  # (P, P, 1) f32: 1 outside the central disk


class LensParams(NamedTuple):
    """Only the defocus coefficient (Noll j=4) trains; the rest is frozen
    (reference ``Image_Caption/Camera/Lens.py:92-96``)."""

    defocus: jnp.ndarray  # () f32
    frozen_pre: jnp.ndarray  # (3,) f32
    frozen_post: jnp.ndarray  # (T-4,) f32


class LensResult(NamedTuple):
    sensor: jnp.ndarray  # (B, P, P, C) in [0, 1] (global max-normalized)
    psf: jnp.ndarray  # (P, P, C), per-channel sum = 1 (before crop mask)
    coeffs: jnp.ndarray  # (T,) full coefficient vector
    psf_loss: jnp.ndarray  # scalar central-disk energy penalty (or 0.0)


def make_lens_constants(
    spec: LensSpec,
    frozen_coeffs: np.ndarray | None = None,
    dtype=np.float32,
) -> LensConstants:
    """Build device constants.

    ``frozen_coeffs`` is the full (T,) coefficient vector whose index 3
    (defocus) is ignored; pass the values from a warm-start checkpoint
    if they are nonzero (they are zero in every shipped config,
    reference ``Image_Caption/Camera/Lens.py:80-96``).  Changing frozen
    coefficients requires rebuilding constants — they are frozen.

    ``dtype=np.float64`` keeps the folded constants (chirps, Fresnel
    kernel, Zernike planes) at full double precision — the host-side
    math is f64 already, this just skips the final f32 rounding.  Used
    by the free-running f64 dynamics goldens; requires x64 mode.
    """
    dtype = np.dtype(dtype)
    n = spec.wave_res
    c = len(spec.wavelengths)
    lam = np.asarray(spec.wavelengths, dtype=np.float64)[None, None, :]
    wave_nos = 2.0 * np.pi / lam
    delta_n = np.asarray(spec.refractive_idcs, dtype=np.float64)[None, None, :] - 1.0

    # Spherical wavefront from a point at `depth`, on the wave grid
    # (reference ``Lens.py:191-210``; f64 mgrid pixel coordinates).
    x, y = np.mgrid[-n // 2 : n // 2, -n // 2 : n // 2].astype(np.float64)
    xs = x / n * spec.physical_size
    ys = y / n * spec.physical_size
    curvature = np.sqrt(xs**2 + ys**2 + spec.depth**2)[:, :, None]
    wavefront = np.exp(1j * wave_nos * curvature)

    # Circular aperture in pixel units: r < max(x) (reference
    # ``Utils.py:88-97`` — note max over the *pixel* grid, i.e. n/2 - 1).
    r = np.sqrt(x**2 + y**2)
    aperture = (r < np.amax(x)).astype(np.float64)[:, :, None]
    static_pre = aperture * wavefront

    # Fresnel transfer function on the 1/4-padded grid
    # (reference ``Utils.py:328-378``).
    m = n + 2 * spec.pad
    fx_full = np.mgrid[-m // 2 : m // 2].astype(np.float64) / (spec.sample_interval * m)
    fx = np.fft.ifftshift(fx_full)
    fxx, fyy = np.meshgrid(fx, fx, indexing="ij")
    squared_sum = (fxx**2 + fyy**2)[:, :, None]
    h = np.exp(1j * (-np.pi * lam * spec.sensor_distance * squared_sum))

    # Central-disk masks on the sensor grid (reference builds them with
    # cv2.circle, ``Lens.py:111-127``; radius-32 disk at the center).
    # cv2's integer rasterization differs from an exact disk by a ring
    # of edge pixels, so use it when available for bit parity.
    p = spec.patch_size
    try:
        import cv2  # noqa: PLC0415

        m = np.zeros((p, p), dtype=np.float64)
        cv2.circle(
            img=m, center=[p // 2, p // 2], radius=spec.mask_radius_px,
            color=1.0, thickness=-1, lineType=cv2.FILLED,
        )
        inside = m.astype(dtype)[:, :, None]
    except ImportError:
        yy2, xx2 = np.indices((p, p), dtype=np.float64)
        rr = np.hypot(yy2 - p // 2, xx2 - p // 2)
        inside = (rr <= spec.mask_radius_px).astype(dtype)[:, :, None]

    # Zernike planes: defocus is the only trainable direction; fold the
    # frozen contribution into one static plane.  Computing just the
    # needed planes (vs the cached full volume) keeps this cheap.
    from .zernike import zernike_basis  # noqa: PLC0415

    if frozen_coeffs is None:
        basis4 = zernike_basis(4, n)[3] * 1e-6
        height_base = np.zeros((n, n), dtype=dtype)
        # The shipped f32 mode reproduces the reference's f32 volume
        # rounding (Lens.py:70) before any further math.
        defocus_plane = basis4.astype(np.float32).astype(dtype)
        if dtype == np.float64:
            defocus_plane = basis4
    else:
        frozen = np.asarray(frozen_coeffs, dtype=np.float64).copy()
        t = frozen.shape[0]
        frozen[3] = 0.0
        vol = zernike_volume(n, t).astype(np.float64)
        if dtype == np.float64:
            vol = zernike_basis(t, n) * 1e-6
        height_base = np.einsum("t,thw->hw", frozen, vol).astype(dtype)
        defocus_plane = vol[3].astype(dtype)

    def split(z):
        return (
            jnp.asarray(z.real, dtype=dtype),
            jnp.asarray(z.imag, dtype=dtype),
        )

    return LensConstants(
        height_base=jnp.asarray(height_base),
        defocus_plane=jnp.asarray(defocus_plane),
        phase_scale=jnp.asarray((wave_nos * delta_n).reshape(c), dtype=dtype),
        static_pre=split(static_pre),
        fresnel_h=split(h),
        mask_keep=jnp.asarray(inside),
        mask_cut=jnp.asarray((1.0 - inside).astype(dtype)),
    )


def init_lens_params(spec: LensSpec) -> LensParams:
    """Zeros everywhere, defocus at its focusing init (reference
    ``Lens.py:80-96``)."""
    return LensParams(
        defocus=jnp.asarray(spec.defocus_init, dtype=jnp.float32),
        frozen_pre=jnp.zeros((3,), dtype=jnp.float32),
        frozen_post=jnp.zeros((spec.zernike_terms - 4,), dtype=jnp.float32),
    )


def lens_coeffs(params: LensParams) -> jnp.ndarray:
    """Full (T,) coefficient vector; frozen parts stop-gradiented."""
    return jnp.concatenate(
        [
            jax.lax.stop_gradient(params.frozen_pre),
            params.defocus[None],
            jax.lax.stop_gradient(params.frozen_post),
        ]
    )


def lens_psf(
    params: LensParams,
    consts: LensConstants,
    spec: LensSpec,
    noise_key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PSF on the sensor grid: (P, P, C) per-channel normalized, plus coeffs."""
    n = spec.wave_res
    height = consts.height_base + params.defocus * consts.defocus_plane
    if noise_key is not None:
        # Manufacturing tolerance: U(-tol, tol) height noise.
        height = height + jax.random.uniform(
            noise_key, (n, n), minval=-spec.height_tolerance, maxval=spec.height_tolerance
        )
    phase = consts.phase_scale[None, None, :] * height[:, :, None]  # (N, N, C)
    pr, pi = cexp(phase)
    fr, fi = cmul(consts.static_pre[0], consts.static_pre[1], pr, pi)

    # Fresnel propagation on the 1/4-padded grid.
    pad = spec.pad
    fr = jnp.pad(fr, ((pad, pad), (pad, pad), (0, 0)))
    fi = jnp.pad(fi, ((pad, pad), (pad, pad), (0, 0)))
    fr, fi = fft2_split(fr, fi, axes=(0, 1))
    fr, fi = cmul(fr, fi, consts.fresnel_h[0], consts.fresnel_h[1])
    fr, fi = fft2_split(fr, fi, axes=(0, 1), inverse=True)
    fr = fr[pad:-pad, pad:-pad, :]
    fi = fi[pad:-pad, pad:-pad, :]

    psf = fr * fr + fi * fi  # (N, N, C) intensities

    # Area downsample 896 -> 256 via the reference's lcm path
    # (``Utils.py:216-248``): nearest-upsample x2 to 1792, 7x7 mean pool.
    p = spec.patch_size
    factor, up = _downsample_plan(n, p)
    if up > 1:
        psf = jnp.repeat(jnp.repeat(psf, up, axis=0), up, axis=1)
    elif factor * p != psf.shape[0]:
        # Reference's general nearest-resize path (Utils.py:237-243):
        # tv Resize(interpolation=0) to (factor*p)^2 then AvgPool(factor)
        # — taken when the lcm upsample exceeds 10x (reference caps
        # upsample_factor at 10 with its "very expensive and not
        # precise" warning) or is non-integer.  ``resize_nearest``
        # replicates torch interpolate-nearest index math exactly.
        from ..ops.image import resize_nearest

        psf = resize_nearest(psf, (factor * p, factor * p))
    psf = psf.reshape(p, factor, p, factor, -1).mean(axis=(1, 3))
    psf = psf / jnp.sum(psf, axis=(0, 1), keepdims=True)  # per-channel
    return psf, lens_coeffs(params)


def _downsample_plan(n: int, p: int) -> tuple[int, int]:
    """(pool factor, nearest-upsample factor) replicating the reference.

    ``up == 1`` with ``factor * p != n`` signals the general
    nearest-resize path (see lens_psf): the reference caps the lcm
    upsample at 10x and nearest-resizes for any non-integer ratio."""
    if n % p == 0:
        return n // p, 1
    lcm = np.lcm(n, p)
    up_total = lcm // p  # pool factor after upsampling to lcm
    if up_total > 10:
        return 10, 1
    if (up_total * p) % n:
        return int(up_total), 1
    return int(up_total), int(up_total * p // n)


def lens_apply(
    params: LensParams,
    consts: LensConstants,
    spec: LensSpec,
    img: jnp.ndarray,
    mask_mode: str | None = "3",
    noise_key: jax.Array | None = None,
    psf_override: jnp.ndarray | None = None,
) -> LensResult:
    """Form the sensor image from an NHWC batch in [0, 1].

    ``mask_mode`` follows the reference's ``prueba`` flag
    (``Lens.py:269-274``): "1" adds the central-disk energy loss, "2"
    hard-crops the PSF to the central disk, "3" does both, None neither.
    ``psf_override`` injects a lab-measured PSF (reference ``psf_lab``).
    """
    if psf_override is not None:
        psf = psf_override / jnp.sum(psf_override, axis=(0, 1), keepdims=True)
        coeffs = lens_coeffs(params)
    else:
        psf, coeffs = lens_psf(params, consts, spec, noise_key)

    psf_loss = jnp.zeros((), psf.dtype)
    if mask_mode in ("1", "3"):
        # || psf * mask1 - psf || = Frobenius norm of the PSF inside the disk.
        psf_loss = jnp.linalg.norm(psf * consts.mask_keep)
    psf_out = psf
    if mask_mode in ("2", "3"):
        psf_out = psf * consts.mask_keep

    sensor = fft_conv2d_linear(img, psf_out)
    # Global max over the whole batch, as the reference (Lens.py:312).
    # Shard-safe by construction: under jit+GSPMD a reduction over a
    # batch-sharded array is a GLOBAL reduce (XLA inserts the collective),
    # so 1-device and N-device runs normalize identically — asserted by
    # tests/test_lens_sharding.py.  (Only a hand-written shard_map/pmap
    # wrapper would see a per-shard max; don't wrap this in one.)
    sensor = sensor / jnp.max(sensor)
    return LensResult(sensor=sensor, psf=psf_out, coeffs=coeffs, psf_loss=psf_loss)
