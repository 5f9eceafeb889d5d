"""TPU compute ops: split-complex DFT-by-matmul transforms, Pallas kernels."""

from .dft import (  # noqa: F401
    cexp,
    cmul,
    fft1_split,
    fft2_real,
    fft2_split,
    ifft2_real_out,
    use_matmul_dft,
)
