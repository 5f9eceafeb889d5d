"""Helpers to load the read-only PyTorch reference for golden parity tests.

The reference depends on ``poppy`` only for its Zernike basis; we stub
that module with our own implementation so both sides share the exact
same basis and any PSF difference is attributable to the optics math.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_poppy_stub():
    from ppvision_tpu.optics.zernike import zernike_basis

    if "poppy" in sys.modules:
        return
    poppy = types.ModuleType("poppy")
    zmod = types.ModuleType("poppy.zernike")

    def _basis(nterms=15, npix=512, outside=0.0, **kwargs):
        return zernike_basis(nterms, npix, outside=outside)

    zmod.zernike_basis = _basis
    poppy.zernike = zmod
    sys.modules["poppy"] = poppy
    sys.modules["poppy.zernike"] = zmod


def install_numpy_compat_shim():
    """The reference calls ``np.math.gcd`` (removed in numpy 2.0)."""
    import math

    import numpy as np

    if not hasattr(np, "math"):
        np.math = math


def install_munch_stub():
    """Minimal munch.Munch: attribute-access dict."""
    if "munch" in sys.modules:
        return
    munch = types.ModuleType("munch")

    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    munch.Munch = Munch
    sys.modules["munch"] = munch


def install_skimage_stub():
    """skimage.filters.gaussian stub (only FaceAligner uses it)."""
    if "skimage" in sys.modules:
        return
    skimage = types.ModuleType("skimage")
    filters = types.ModuleType("skimage.filters")
    filters.gaussian = lambda x, *a, **k: x
    skimage.filters = filters
    sys.modules["skimage"] = skimage
    sys.modules["skimage.filters"] = filters


def import_face_deid_models():
    """Import reference core.model / core.wing (torch, CPU)."""
    install_munch_stub()
    install_skimage_stub()
    path = f"{REFERENCE_ROOT}/Face-DeId"
    if path not in sys.path:
        sys.path.insert(0, path)
    from core import model as ref_model  # noqa: PLC0415
    from core import wing as ref_wing  # noqa: PLC0415

    return ref_model, ref_wing


def install_torchvision_stub():
    """Minimal torchvision stub for the reference optics path.

    Only ``transforms.Resize(size, interpolation=0)`` is exercised
    (area downsampling and the img_psf_conv crop-resize); real
    torchvision implements it with ``F.interpolate(mode='nearest')`` on
    tensors, which is what we provide.
    """
    if "torchvision" in sys.modules:
        return
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Resize:
        def __init__(self, size, interpolation=0):
            self.size = [size, size] if isinstance(size, int) else list(size)

        def __call__(self, x):
            return F.interpolate(x, size=tuple(self.size), mode="nearest")

    transforms.Resize = Resize
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def install_ffmpeg_stub():
    """core/utils.py imports ffmpeg-python at module level; only the
    video writers call into it (never exercised by goldens)."""
    if "ffmpeg" in sys.modules:
        return
    sys.modules["ffmpeg"] = types.ModuleType("ffmpeg")


def _extend_torchvision_stub():
    """core/utils.py needs ``torchvision.utils``; metrics/{fid,lpips}.py
    need ``torchvision.models`` — import-time attributes only (the
    goldens never construct the torchvision nets)."""
    install_torchvision_stub()
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "utils"):
        vutils = types.ModuleType("torchvision.utils")
        tv.utils = vutils
        sys.modules["torchvision.utils"] = vutils
    if not hasattr(tv, "models"):
        models = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision models are stubbed in tests")

        models.alexnet = _unavailable
        models.inception_v3 = _unavailable
        models.resnet101 = _unavailable
        tv.models = models
        sys.modules["torchvision.models"] = models
    if "torchvision.datasets" not in sys.modules:
        datasets = types.ModuleType("torchvision.datasets")

        class ImageFolder:  # constructed only by the (unused) loaders
            def __init__(self, *a, **k):
                raise RuntimeError("torchvision datasets are stubbed in tests")

        datasets.ImageFolder = ImageFolder
        tv.datasets = datasets
        sys.modules["torchvision.datasets"] = datasets


def import_face_deid_solver():
    """Import the reference core.solver MODULE (for compute_d_loss /
    compute_g_loss / moving_average — the live training math, not
    re-typed copies).  Solver's import chain pulls data_loader, utils,
    metrics and Camera, hence the stub pile."""
    install_munch_stub()
    install_skimage_stub()
    install_poppy_stub()
    install_ffmpeg_stub()
    install_numpy_compat_shim()
    _extend_torchvision_stub()
    _fresh_camera_package("Face-DeId")
    from core import solver as ref_solver  # noqa: PLC0415

    return ref_solver


def _fresh_camera_package(project: str):
    """Both reference projects ship a ``Camera`` package; purge any
    previously imported one and put ``project`` first on sys.path so the
    intra-package star-imports resolve within the right project."""
    for mod in [m for m in sys.modules if m == "Camera" or m.startswith("Camera.")]:
        del sys.modules[mod]
    for p in (f"{REFERENCE_ROOT}/Face-DeId", f"{REFERENCE_ROOT}/Image_Caption"):
        while p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, f"{REFERENCE_ROOT}/{project}")


def import_face_deid_camera():
    """Import the reference Face-DeId Camera class (torch, CPU)."""
    install_poppy_stub()
    _fresh_camera_package("Face-DeId")
    from Camera.Optics import Camera  # noqa: PLC0415

    return Camera


def import_caption_lens():
    """Import the reference Image_Caption OpticsZernike class."""
    install_poppy_stub()
    install_torchvision_stub()
    install_numpy_compat_shim()
    _fresh_camera_package("Image_Caption")
    from Camera.Lens import OpticsZernike  # noqa: PLC0415

    return OpticsZernike


def import_caption_models(resnet101_factory):
    """Import the reference Image_Caption models.py (Encoder /
    DecoderWithAttention) plus its utils helpers, with
    ``torchvision.models.resnet101`` stubbed by ``resnet101_factory``
    (the Encoder constructs it at init, models.py:17 — the real
    torchvision download is unavailable and the tests substitute a
    torchvision-layout mini ResNet).

    Returns (models_module, utils_module), both patched to CPU.
    """
    import torch

    install_poppy_stub()
    install_numpy_compat_shim()
    _extend_torchvision_stub()
    sys.modules["torchvision.models"].resnet101 = resnet101_factory
    _fresh_camera_package("Image_Caption")
    # Both reference projects (and this repo's own tests dir) could
    # shadow the generic module names; force a fresh import from
    # Image_Caption.
    for mod in ("models", "utils", "pytorch_ssim"):
        sys.modules.pop(mod, None)
    import models as ref_cap_models  # noqa: PLC0415
    import utils as ref_cap_utils  # noqa: PLC0415

    # models.py / utils.py pin a module-level cuda device; run on CPU.
    ref_cap_models.device = torch.device("cpu")
    if hasattr(ref_cap_utils, "device"):
        ref_cap_utils.device = torch.device("cpu")
    return ref_cap_models, ref_cap_utils
