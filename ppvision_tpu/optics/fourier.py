"""FFT-convolution helpers for image formation (split-complex, TPU-safe).

Replaces the reference's torch helpers (``Face-DeId/Camera/Utils.py``
``conv2D/fftshift/ifftshift``; ``Image_Caption/Camera/Utils.py``
``psf2otf/img_psf_conv``) with shape-static ops over split-complex
(re, im) pairs, so no complex dtype ever reaches the TPU.  Layout is
NHWC (channels last) — the TPU-native conv/vector layout.  Transforms
go through :mod:`ppvision_tpu.ops.dft` (MXU matmul-DFT on TPU,
``jnp.fft`` elsewhere).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.dft import cmul, fft2_real, fft2_split, ifft2_real_out

__all__ = [
    "fft_conv2d_circular",
    "psf2otf_split",
    "fft_conv2d_linear",
]


def fft_conv2d_circular(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular FFT convolution over the (H, W) axes of an NHWC image.

    Equivalent of the reference's ``conv2D`` (rfftn multiply,
    ``Face-DeId/Camera/Utils.py:7-12``).  ``kernel`` is (H, W, C) or
    broadcastable to img's (B, H, W, C); the kernel is expected already
    rolled so its center sits at the (0, 0) corner.

    On TPU, ``PPVISION_FUSED_FFTCONV=1`` routes VMEM-fitting shapes
    through the fused Pallas kernel (:mod:`ppvision_tpu.ops.fftconv`):
    one HBM read + one write per image instead of ~14 array-passes
    through the unfused DFT chain.  Opt-in: the kernel's ~4 min Mosaic
    compile outweighs the camera's ~1 ms unfused cost in every shipped
    pipeline (PERF.md round-3c).  (Under a multi-chip mesh the Pallas
    call is not auto-partitioned; the single-chip decode/serve/bench
    paths are where it applies.)
    """
    import jax

    from ..ops.fftconv import fft_conv2d_circular_fused, fused_fftconv_eligible

    if (
        img.ndim == 4
        and jax.default_backend() == "tpu"
        and fused_fftconv_eligible(img.shape, kernel.ndim)
    ):
        return fft_conv2d_circular_fused(img, kernel)
    ir, ii = fft2_real(img, axes=(-3, -2))
    kr, ki = fft2_real(kernel, axes=(-3, -2))
    return ifft2_real_out(*cmul(ir, ii, kr, ki), axes=(-3, -2))


def psf2otf_split(psf: jnp.ndarray, output_hw: tuple[int, int]):
    """Zero-pad a centered (H, W, C) PSF to ``output_hw`` and DFT it.

    Mirrors the reference's ``psf2otf`` (``Image_Caption/Camera/
    Utils.py:127-158``) including its off-by-one-favoring-top-left pad
    split for even pad amounts, so OTFs match numerically.  Returns the
    OTF as a split-complex pair.
    """
    fh, fw, _ = psf.shape
    oh, ow = output_hw
    if oh != fh or ow != fw:
        pad_h = oh - fh
        pad_w = ow - fw
        if pad_h % 2 != 0:
            top, bottom = pad_h // 2 + 1, pad_h // 2
        else:
            top, bottom = pad_h // 2 + 1, pad_h // 2 - 1
        if pad_w % 2 != 0:
            left, right = pad_w // 2 + 1, pad_w // 2
        else:
            left, right = pad_w // 2 + 1, pad_w // 2 - 1
        psf = jnp.pad(psf, ((top, bottom), (left, right), (0, 0)))
    psf = jnp.fft.ifftshift(psf, axes=(0, 1))
    return fft2_real(psf, axes=(0, 1))


def fft_conv2d_linear(img: jnp.ndarray, psf: jnp.ndarray) -> jnp.ndarray:
    """Linear (padded) FFT convolution of an NHWC image with a centered PSF.

    Equivalent of the reference's ``img_psf_conv`` with
    ``circular=False`` (``Image_Caption/Camera/Utils.py:251-297``): the
    image is zero-padded to 2x its side, convolved circularly with the
    ``psf2otf`` kernel, then the original window (with the reference's
    one-pixel crop-and-nearest-resize quirk) is returned.
    """
    b, h, w, c = img.shape
    pad_h, pad_w = h // 2, w // 2
    padded = jnp.pad(img, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    otf_r, otf_i = psf2otf_split(psf, (2 * h, 2 * w))
    ir, ii = fft2_real(padded, axes=(1, 2))
    rr, ri = cmul(ir, ii, otf_r[None], otf_i[None])
    out_r, out_i = fft2_split(rr, ri, axes=(1, 2), inverse=True)
    # Reference takes torch.abs of the complex result; a tiny floor keeps
    # the sqrt gradient finite where the output is exactly zero.
    out = jnp.sqrt(out_r * out_r + out_i * out_i + 1e-24)
    # The reference crops [pad+1 : -pad] then nearest-resizes (H-1 -> H),
    # which duplicates the last row/col.  Reproduce that exactly.
    out = out[:, pad_h + 1 : 2 * h - pad_h, pad_w + 1 : 2 * w - pad_w, :]
    row_idx = jnp.clip((jnp.arange(h) * (h - 1)) // h, 0, h - 2)
    col_idx = jnp.clip((jnp.arange(w) * (w - 1)) // w, 0, w - 2)
    return out[:, row_idx][:, :, col_idx]
