"""Flagship de-identification pipeline: camera -> heatmap -> generator.

This is the inference path the reference's ``--mode sample`` drives
(``Face-DeId/core/utils.py:152-196`` via solver.py:250-278) and the
throughput path BASELINE.json measures (de-id images/sec/chip):

1. the learned-optics camera forms the privacy-preserved image;
2. ``fan_priv`` regresses the two privacy heatmap masks from it;
3. the StarGAN-v2 generator synthesizes the anonymized face from the
   privacy image + masks + a style code (from a reference face or a
   latent z).

Everything is one jittable pure function of parameter pytrees; batch
data-parallelism is just sharding the batch axis of the inputs.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .config import FaceDeIdConfig
from .models.fan import FAN, get_heatmap
from .models.stargan import build_gan_models
from .optics.camera import (
    CameraConstants,
    CameraParams,
    CameraSpec,
    camera_apply,
    init_camera_params,
    make_camera_constants,
)

__all__ = ["DeIdBundle", "build_deid", "deid_from_reference", "deid_from_latent", "deid_multi_style"]


@struct.dataclass
class DeIdParams:
    camera: CameraParams
    camera_consts: CameraConstants
    fan_priv: Any
    generator: Any
    mapping_network: Any
    style_encoder: Any


class DeIdBundle(NamedTuple):
    """Modules (static) + params (pytree) for the de-id pipeline."""

    cfg: FaceDeIdConfig
    models: dict[str, Any]
    fan: FAN
    params: DeIdParams


def build_deid(key: jax.Array, cfg: FaceDeIdConfig | None = None) -> DeIdBundle:
    """Construct the pipeline with fresh (he-init / random) parameters.

    Pretrained weights load over this via utils.checkpoint.
    """
    cfg = cfg or FaceDeIdConfig()
    dtype = jnp.dtype(cfg.model.compute_dtype)
    models = build_gan_models(
        img_size=cfg.model.img_size,
        style_dim=cfg.model.style_dim,
        latent_dim=cfg.model.latent_dim,
        num_domains=cfg.model.num_domains,
        w_hpf=cfg.model.w_hpf,
        max_conv_dim=cfg.model.max_conv_dim,
        dtype=dtype,
        quant_decode=cfg.model.quant_decode,
    )
    fan = FAN(dtype=dtype)
    kc, kf, kg, km, ke = jax.random.split(key, 5)
    n = cfg.model.img_size
    spec = CameraSpec(n=n, zernike_terms=cfg.camera.zernike_terms)
    x = jnp.zeros((1, n, n, 3))
    s = jnp.zeros((1, cfg.model.style_dim))
    z = jnp.zeros((1, cfg.model.latent_dim))
    y = jnp.zeros((1,), dtype=jnp.int32)
    masks = (jnp.zeros((1, 256, 256, 1)), jnp.zeros((1, 256, 256, 1)))
    params = DeIdParams(
        camera=init_camera_params(kc, spec),
        camera_consts=make_camera_constants(spec),
        fan_priv=fan.init(kf, jnp.zeros((1, 256, 256, 3)))["params"],
        generator=models["generator"].init(kg, x, s, masks)["params"],
        mapping_network=models["mapping_network"].init(km, z, y)["params"],
        style_encoder=models["style_encoder"].init(ke, x, y)["params"],
    )
    return DeIdBundle(cfg=cfg, models=models, fan=fan, params=params)


def _privacy_front(bundle: DeIdBundle, params: DeIdParams, x_src: jnp.ndarray):
    from .utils.validate import check_image_batch

    check_image_batch(x_src, "x_src", size=bundle.cfg.model.img_size)
    x_priv, _ = camera_apply(params.camera, params.camera_consts, x_src)
    masks = get_heatmap(bundle.fan, params.fan_priv, x_priv, privacy=True)
    return x_priv, masks


def deid_from_reference(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    x_ref: jnp.ndarray,
    y_ref: jnp.ndarray,
) -> jnp.ndarray:
    """Anonymize ``x_src`` in the style of reference faces ``x_ref``."""
    from .utils.validate import check_image_batch, check_labels

    check_image_batch(x_ref, "x_ref", size=bundle.cfg.model.img_size)
    check_labels(y_ref, "y_ref", batch=x_ref.shape[0])
    x_priv, masks = _privacy_front(bundle, params, x_src)
    s_ref = bundle.models["style_encoder"].apply(
        {"params": params.style_encoder}, x_ref, y_ref
    )
    return bundle.models["generator"].apply(
        {"params": params.generator}, x_priv, s_ref, masks
    )


def deid_from_latent(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    z: jnp.ndarray,
    y_trg: jnp.ndarray,
) -> jnp.ndarray:
    """Anonymize ``x_src`` with styles mapped from latent codes ``z``."""
    from .utils.validate import check_labels

    check_labels(y_trg, "y_trg", batch=x_src.shape[0])
    x_priv, masks = _privacy_front(bundle, params, x_src)
    s = bundle.models["mapping_network"].apply(
        {"params": params.mapping_network}, z, y_trg
    )
    return bundle.models["generator"].apply(
        {"params": params.generator}, x_priv, s, masks
    )


def deid_multi_style(
    bundle: DeIdBundle,
    params: DeIdParams,
    x_src: jnp.ndarray,
    x_ref: jnp.ndarray,
    y_ref: jnp.ndarray,
) -> jnp.ndarray:
    """All (source, reference-style) anonymizations: (R, B, H, W, 3).

    The eval workload (reference metrics/eval.py:57-93 generates
    ``num_outs_per_domain`` outputs per source). Runs the privacy front
    + generator ENCODER once at batch B, then ``lax.scan``s the
    style-modulated decoder over the R styles — the high-pass skip-add
    stays a same-shape add at batch B (the flat R*B formulation pays
    ~16 ms/step of R-tiled skip broadcasts at bench shapes).
    """
    from .models.stargan import Generator

    x_priv, masks = _privacy_front(bundle, params, x_src)
    s_ref = bundle.models["style_encoder"].apply(
        {"params": params.style_encoder}, x_ref, y_ref
    )
    gen = bundle.models["generator"]
    z, hps = gen.apply(
        {"params": params.generator}, x_priv, masks, method=Generator.encode
    )

    # Stack the per-style outputs in the COMPUTE dtype: the scan's
    # dynamic-update-slice writes the full (R, B, H, W, 3) buffer, and
    # stacking f32 costs 2x the bytes (~8 ms/step at bench shapes) for
    # precision the bf16 pipeline never had.  The f32 cast happens once
    # on the stacked result.
    dtype = jnp.dtype(bundle.cfg.model.compute_dtype)

    def body(_, s):
        sb = jnp.broadcast_to(s[None], (z.shape[0], s.shape[-1]))
        out = gen.apply(
            {"params": params.generator}, z, sb, hps, method=Generator.decode
        )
        return None, out.astype(dtype)

    _, fakes = jax.lax.scan(body, None, s_ref)
    return fakes.astype(jnp.float32)
