"""Differentiable wave-optics core (Zernike masks, propagation, PSFs)."""

from .camera import (  # noqa: F401
    CameraConstants,
    CameraParams,
    CameraSpec,
    PsfResult,
    camera_apply,
    compute_psf,
    full_coeffs,
    init_camera_params,
    make_camera_constants,
)
from .fourier import (  # noqa: F401
    fft_conv2d_circular,
    fft_conv2d_linear,
    psf2otf_split,
)
from .lens import (  # noqa: F401
    LensConstants,
    LensParams,
    LensResult,
    LensSpec,
    init_lens_params,
    lens_apply,
    lens_coeffs,
    lens_psf,
    make_lens_constants,
)
from .zernike import noll_to_nm, zernike_basis, zernike_nm, zernike_volume  # noqa: F401
