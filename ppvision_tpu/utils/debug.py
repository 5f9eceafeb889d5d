"""Training debug visualization: the reference's 10-panel grid.

Reproduces the ``debug_every`` grid of ``Face-DeId/core/solver.py:
216-248`` — top row Org / Priv / Fake / Rec / Ref images, bottom row the
corresponding FAN heatmaps (jet colormap) — written to
``debug_dir/Img_{step}.svg`` (or pushed to wandb by the caller).
Also exposes PSF / height-map imaging equivalent to the captioning
camera's comet hooks (``Image_Caption/Camera/Utils.py:25-63``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_debug_forward", "save_debug_grid", "save_psf_image"]


def make_debug_forward(models, fan, cfg, lat_style: bool = True):
    """Jitted recompute of the debug tensors from a train batch.

    Returns ``fwd(params, frozen, batch) -> (images, heats)`` where both
    are dicts of arrays (first sample used by ``save_debug_grid``).
    """
    from ..models.fan import get_heatmap
    from ..optics.camera import camera_apply

    fis = cfg.model.fan_input_size

    def first(h):
        return h[0] if isinstance(h, (tuple, list)) else h[..., :1]

    @jax.jit
    def fwd(params: dict, frozen, batch: dict):
        x_src, y_src = batch["x_src"], batch["y_src"]
        x_ref, y_trg = batch["x_ref"], batch["y_ref"]
        x_real, _ = camera_apply(frozen.camera_params, frozen.camera_consts, x_src)
        masks = get_heatmap(fan, frozen.fan_priv_params, x_real, privacy=True,
                            input_size=fis)
        if lat_style:
            s = models["mapping_network"].apply(
                {"params": params["mapping_network"]}, batch["z_trg"], y_trg
            )
        else:
            s = models["style_encoder"].apply(
                {"params": params["style_encoder"]}, x_ref, y_trg
            )
        x_fake = models["generator"].apply(
            {"params": params["generator"]}, x_real, s, masks
        )
        s_org = models["style_encoder"].apply(
            {"params": params["style_encoder"]}, x_real, y_src
        )
        x_rec = models["generator"].apply(
            {"params": params["generator"]}, x_fake, s_org, None
        )
        images = dict(Org=x_src, Priv=x_real, Fake=x_fake, Rec=x_rec, Ref=x_ref)
        heats = dict(
            Org=first(get_heatmap(fan, frozen.fan_params, x_src, input_size=fis)),
            Priv=masks[0],
            Fake=first(get_heatmap(fan, frozen.fan_params, x_fake, input_size=fis)),
            Rec=get_heatmap(fan, frozen.fan_priv_params, x_rec, privacy=True,
                            input_size=fis)[0],
            Ref=first(get_heatmap(fan, frozen.fan_params, x_ref, input_size=fis)),
        )
        return images, heats

    return fwd


def save_debug_grid(images: dict, heats: dict, path: str) -> None:
    """2x5 matplotlib grid of the first sample (solver.py:223-247)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 5, figsize=(15, 6))
    for j, (name, img) in enumerate(images.items()):
        arr = np.asarray(img[0], np.float32)
        axes[0, j].imshow(np.clip(arr / max(arr.max(), 1e-8), 0, 1))
        axes[0, j].set_title(name)
        axes[0, j].axis("off")
    for j, (name, hm) in enumerate(heats.items()):
        axes[1, j].imshow(np.asarray(hm[0, ..., 0], np.float32), cmap="jet")
        axes[1, j].axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_psf_image(psf: Any, path: str, log_scale: bool = True) -> None:
    """PSF (H, W, C) -> normalized PNG (Camera/Utils.py:25-63 analog)."""
    from PIL import Image

    arr = np.asarray(psf, np.float64)
    if log_scale:
        arr = np.log1p(arr / max(arr.max(), 1e-12) * 1e4)
    arr = arr / max(arr.max(), 1e-12)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)
