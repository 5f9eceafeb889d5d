"""Fused Pallas FFT-convolution: the whole circular conv in one kernel.

The camera's image-formation step (reference ``Face-DeId/Camera/
Utils.py:7-12`` ``conv2D``: rfftn -> multiply -> irfftn, called from
``Optics.py:122-129``) is the framework's bandwidth hog: as separate
XLA ops, each DFT axis pass round-trips the whole (B, H, W, C)
split-complex batch through HBM (~14 array-passes per conv).  This
kernel computes the complete chain

    FFT_H -> FFT_W -> (* OTF) -> IFFT_W -> IFFT_H

per image inside VMEM: HBM sees ONE read of the image and ONE write of
the result (plus the small constant DFT matrices / OTF).

Layout trick — no transposes anywhere: images are viewed as
(B, H, W*C) (a free reshape of NHWC).  The H-axis DFT is a plain
left-matmul with the (H, H) cos/sin matrices; the W-axis DFT is a
right-matmul with ``kron(M_W, I_C)`` — a (W*C, W*C) block-interleaved
matrix that transforms every channel independently while the channels
stay interleaved in the lane dimension.  cos/sin DFT matrices are
symmetric, so the same four constants serve forward and inverse (the
1/(H*W) inverse scale is applied once at the end).

Matmuls run at ``Precision.HIGHEST`` like :mod:`ppvision_tpu.ops.dft`,
so results match the unfused split-complex path to f32 accuracy.
Backward is a custom VJP through the unfused XLA path (circular-conv
gradients are themselves circular convs).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft_conv2d_circular_pallas",
    "fft_conv2d_circular_fused",
    "fused_fftconv_eligible",
]

_PRECISION = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=8)
def _mats_np(h: int, w: int, c: int):
    j, k = np.meshgrid(np.arange(h), np.arange(h), indexing="ij")
    ang = 2.0 * np.pi * j * k / h
    mhc = np.cos(ang).astype(np.float32)
    mhs = np.sin(ang).astype(np.float32)
    j, k = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    ang = 2.0 * np.pi * j * k / w
    eye = np.eye(c, dtype=np.float32)
    kwc = np.kron(np.cos(ang).astype(np.float32), eye)
    kws = np.kron(np.sin(ang).astype(np.float32), eye)
    return mhc, mhs, kwc, kws


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )


def _fftconv_kernel(
    x_ref, khr_ref, khi_ref, mhc_ref, mhs_ref, kwc_ref, kws_ref, out_ref,
    *, bb: int, inv_scale: float,
):
    mhc = mhc_ref[...]
    mhs = mhs_ref[...]
    kwc = kwc_ref[...]
    kws = kws_ref[...]
    khr = khr_ref[...]
    khi = khi_ref[...]
    for i in range(bb):
        x = x_ref[i]  # (H, W*C) real
        # FFT along H (real input): F = C - iS.
        t1r = _mm(mhc, x)
        t1i = -_mm(mhs, x)
        # FFT along W (right-multiply; cos/sin matrices are symmetric).
        t2r = _mm(t1r, kwc) + _mm(t1i, kws)
        t2i = _mm(t1i, kwc) - _mm(t1r, kws)
        # Pointwise OTF multiply.
        zr = t2r * khr - t2i * khi
        zi = t2r * khi + t2i * khr
        # IFFT along W: F^-1 = (C + iS)/W (scale folded into inv_scale).
        t3r = _mm(zr, kwc) - _mm(zi, kws)
        t3i = _mm(zi, kwc) + _mm(zr, kws)
        # IFFT along H, real part only: re[(C + iS)(zr + i zi)]/H.
        yr = _mm(mhc, t3r) - _mm(mhs, t3i)
        out_ref[i] = yr * inv_scale


def fft_conv2d_circular_pallas(
    img: jnp.ndarray,  # (B, H, W, C) real
    khat_r: jnp.ndarray,  # (H, W, C) OTF real part
    khat_i: jnp.ndarray,  # (H, W, C) OTF imag part
    block_b: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused circular FFT-conv forward (see module doc)."""
    from jax.experimental import pallas as pl

    b, h, w, c = img.shape
    wc = w * c
    if block_b is None:
        # Keep the per-step VMEM working set ~<= 8 MB.
        budget = 8 * 2**20 - 2 * 4 * (h * h + wc * wc + h * wc)
        block_b = max(1, min(8, b, budget // (10 * 4 * h * wc)))
    while b % block_b:
        block_b -= 1

    mhc, mhs, kwc, kws = _mats_np(h, w, c)
    x2 = img.reshape(b, h, wc)
    const = partial(pl.BlockSpec, index_map=lambda i: (0, 0))

    out = pl.pallas_call(
        partial(_fftconv_kernel, bb=block_b, inv_scale=1.0 / (h * w)),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, wc), lambda i: (i, 0, 0)),
            const((h, wc)),
            const((h, wc)),
            const((h, h)),
            const((h, h)),
            const((wc, wc)),
            const((wc, wc)),
        ],
        out_specs=pl.BlockSpec((block_b, h, wc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wc), jnp.float32),
        interpret=interpret,
    )(
        x2.astype(jnp.float32),
        khat_r.reshape(h, wc), khat_i.reshape(h, wc),
        jnp.asarray(mhc), jnp.asarray(mhs), jnp.asarray(kwc), jnp.asarray(kws),
    )
    return out.reshape(b, h, w, c)


def fused_fftconv_eligible(img_shape, kernel_ndim: int) -> bool:
    """Opt-in (``PPVISION_FUSED_FFTCONV=1``), per-image kernel,
    MXU-friendly sizes, VMEM fits.

    Opt-in rather than default because the trade is compile time for
    HBM bytes the camera stage barely spends: Mosaic compiles this
    kernel in ~4 minutes (measured on v5e; 10 HIGHEST-precision
    matmuls unrolled), while the camera's whole unfused conv chain is
    ~1 ms of a 269 ms bench step.  See PERF.md round-3c for the
    on-chip numbers.
    """
    if os.environ.get("PPVISION_FUSED_FFTCONV", "0") != "1":
        return False
    if kernel_ndim != 3 or len(img_shape) != 4:
        return False
    # The Pallas call is not auto-partitioned: degrade safely to the
    # unfused chain on multi-device / multi-process topologies instead
    # of relying on the caller having read the docstring.
    if len(jax.devices()) != 1 or jax.process_count() != 1:
        return False
    b, h, w, c = img_shape
    wc = w * c
    if h % 8 or wc % 128:
        return False
    # Constants + one image's working set must fit comfortably in VMEM.
    const_bytes = 4 * (2 * h * h + 2 * wc * wc + 2 * h * wc)
    work_bytes = 10 * 4 * h * wc
    return const_bytes + work_bytes < 13 * 2**20


@partial(jax.custom_vjp, nondiff_argnums=())
def fft_conv2d_circular_fused(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular FFT conv with the fused Pallas forward.

    Same contract as :func:`ppvision_tpu.optics.fourier.
    fft_conv2d_circular` for a (H, W, C) kernel.  Differentiable: the
    backward pass runs the unfused XLA formulas (the gradient of a
    circular conv is a circular conv with the conjugate OTF).
    """
    from ..ops.dft import fft2_real

    khat_r, khat_i = fft2_real(kernel, axes=(0, 1))
    return fft_conv2d_circular_pallas(img, khat_r, khat_i)


def _fused_fwd(img, kernel):
    return fft_conv2d_circular_fused(img, kernel), (img, kernel)


def _fused_bwd(res, g):
    from ..ops.dft import cmul, fft2_real, ifft2_real_out

    img, kernel = res
    gr, gi = fft2_real(g, axes=(-3, -2))
    kr, ki = fft2_real(kernel, axes=(0, 1))
    # d/dimg: conv of g with the conjugate OTF.
    d_img = ifft2_real_out(*cmul(gr, gi, kr, -ki), axes=(-3, -2))
    # d/dkernel: batch-summed correlation of img with g.
    ir, ii = fft2_real(img, axes=(-3, -2))
    dk = ifft2_real_out(
        *cmul(ir, -ii, gr, gi), axes=(-3, -2)
    ).sum(axis=0)
    return d_img, dk


fft_conv2d_circular_fused.defvjp(_fused_fwd, _fused_bwd)
