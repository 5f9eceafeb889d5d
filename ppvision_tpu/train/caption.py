"""Privacy-preserving captioning trainer (reference train.py as one jitted step).

Per batch (reference ``Image_Caption/train.py:243-352``):

1. camera forms the privacy sensor image (+PSF mask loss, mode "3");
2. ResNet-101 encoder (stem+layer1 frozen, layer2-4 fine-tuned,
   models.py:43-54) -> 36x36x2048 features;
3. attention-LSTM decoder, teacher-forced;
4. ``loss = 0.4*(CE + alpha_c*doubly_stochastic) + 6*(1 - SSIM(orig,
   sensor)) + 30*psf_loss`` (train.py:280-286);
5. three Adam optimizers (camera 5e-7 / encoder 1e-4 / decoder 5e-4);
   decoder+encoder gradients value-clamped to +/-5 *after* the camera
   update (train.py:303-320).  The reference's zernike clamp
   (train.py:322-323) indexes ``[1:]`` of a single-coefficient tensor —
   a no-op in the shipped defocus-only config — so it is not applied.

The whole iteration is one jitted function; encoder BatchNorm
statistics ride in the state as a mutable collection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import CaptionConfig
from ..metrics.psnr_ssim import ssim
from ..models.captioner import AttentionLSTMDecoder, caption_loss
from ..models.resnet import CaptionEncoder
from ..optics.lens import LensConstants, LensParams, LensSpec, lens_apply

__all__ = ["CaptionTrainState", "init_caption", "make_caption_train_step"]


class CaptionTrainState(struct.PyTreeNode):
    camera: LensParams
    encoder: Any  # {'params':..., 'batch_stats':...}
    decoder: Any  # params
    opt_camera: Any
    opt_encoder: Any
    opt_decoder: Any
    step: jnp.ndarray


def _encoder_trainable_mask(params: Any, n_stage1_blocks: int = 3) -> Any:
    """Fine-tune ResNet stages >= layer2 only (reference models.py:43-54):
    freeze the stem convs/BNs and the first bottleneck stage
    (``n_stage1_blocks`` blocks; 3 for ResNet-101)."""
    frozen = {f"Bottleneck_{i}" for i in range(n_stage1_blocks)} | {
        "Conv_0",
        "BatchNorm_0",
    }

    def fill(tree, val):
        return jax.tree_util.tree_map(lambda _: val, tree)

    out = {}
    for top_k, top_v in params.items():
        if top_k.startswith("ResNetBackbone") and isinstance(top_v, dict):
            # Freeze by the backbone's DIRECT children only (nested
            # submodules reuse the names Conv_0/BatchNorm_0).
            out[top_k] = {
                k: fill(v, 0.0 if k in frozen else 1.0) for k, v in top_v.items()
            }
        else:
            out[top_k] = fill(top_v, 1.0)
    return out


def make_optimizers(cfg: CaptionConfig):
    def clipped_adam(lr):
        # torch Adam + post-hoc value clamp of gradients (utils.py:356-366).
        return optax.chain(
            optax.clip(cfg.grad_clip),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.scale(-lr),
        )

    def plain_adam(lr):
        return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999), optax.scale(-lr))

    return (
        plain_adam(cfg.camera_lr),
        clipped_adam(cfg.encoder_lr),
        clipped_adam(cfg.decoder_lr),
    )


def init_caption(
    key: jax.Array,
    cfg: CaptionConfig,
    vocab_size: int,
    lens_spec: LensSpec,
    lens_params: LensParams,
    encoder_stages: tuple[int, ...] = (3, 4, 23, 3),
    dtype: Any = None,
):
    """Build encoder/decoder modules and the full train state."""
    encoder = CaptionEncoder(
        encoded_image_size=cfg.encoded_image_size, stage_sizes=encoder_stages,
        dtype=dtype,
    )
    decoder = AttentionLSTMDecoder(
        vocab_size=vocab_size,
        embed_dim=cfg.emb_dim,
        decoder_dim=cfg.decoder_dim,
        attention_dim=cfg.attention_dim,
        dropout=cfg.dropout,
    )
    ke, kd = jax.random.split(key)
    p = lens_spec.patch_size
    enc_vars = encoder.init(ke, jnp.zeros((1, p, p, 3)), train=False)
    s = cfg.encoded_image_size
    dec_params = decoder.init(
        kd,
        jnp.zeros((1, s, s, 2048)),
        jnp.zeros((1, 5), dtype=jnp.int32),
        jnp.asarray([5]),
    )["params"]

    opt_cam, opt_enc, opt_dec = make_optimizers(cfg)
    state = CaptionTrainState(
        camera=lens_params,
        encoder=dict(enc_vars),
        decoder=dec_params,
        opt_camera=opt_cam.init(lens_params),
        opt_encoder=opt_enc.init(enc_vars["params"]),
        opt_decoder=opt_dec.init(dec_params),
        step=jnp.zeros((), jnp.int32),
    )
    return encoder, decoder, state


def make_caption_train_step(
    encoder: CaptionEncoder,
    decoder: AttentionLSTMDecoder,
    cfg: CaptionConfig,
    lens_spec: LensSpec,
    lens_consts: LensConstants,
    camera_train: bool = True,
):
    opt_cam, opt_enc, opt_dec = make_optimizers(cfg)

    def enc_apply(enc_vars, sensor):
        return encoder.apply(enc_vars, sensor, train=True, mutable=["batch_stats"])

    if cfg.remat:
        # Recompute the ResNet-101 activations in the backward pass —
        # the biggest activation store of the step (cfg.remat; math
        # unchanged, tested in test_train_caption.py).
        enc_apply = jax.checkpoint(enc_apply)

    def forward(camera_p, enc_vars, dec_params, batch, rng):
        noise_key, drop_key = jax.random.split(rng)
        res = lens_apply(
            camera_p, lens_consts, lens_spec, batch["images"],
            mask_mode=cfg.mask_mode, noise_key=noise_key,
        )
        enc_out, enc_mut = enc_apply(enc_vars, res.sensor)
        out = decoder.apply(
            {"params": dec_params},
            enc_out,
            batch["captions"],
            batch["caption_lengths"],
            deterministic=False,
            rngs={"dropout": drop_key},
        )
        ce, dsr, acc5 = caption_loss(out, batch["captions"], cfg.alpha_c)
        ssim_val = ssim(batch["images"], res.sensor)
        # Camera fidelity flavor (train.py:171-175; 284): the shipped
        # reference default is camera_loss='MSE'.
        if cfg.camera_loss == "MSE":
            cam_term = 1.0 - jnp.mean((batch["images"] - res.sensor) ** 2)
        else:
            cam_term = 1.0 - ssim_val
        loss = (
            cfg.w_caption * (ce + cfg.alpha_c * dsr)
            + cfg.w_ssim * cam_term
            + cfg.w_psf * res.psf_loss
        )
        metrics = dict(
            loss=loss, ce=ce, dsr=dsr, top5=acc5, ssim=ssim_val,
            psf_loss=res.psf_loss,
        )
        return loss, (metrics, enc_mut)

    @jax.jit
    def train_step(state: CaptionTrainState, batch: dict, rng: jax.Array):
        def loss_fn(camera_p, enc_params, dec_params):
            enc_vars = {"params": enc_params, **{
                k: v for k, v in state.encoder.items() if k != "params"
            }}
            return forward(camera_p, enc_vars, dec_params, batch, rng)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (_, (metrics, enc_mut)), (g_cam, g_enc, g_dec) = grad_fn(
            state.camera, state.encoder["params"], state.decoder
        )
        if not camera_train:
            g_cam = jax.tree_util.tree_map(jnp.zeros_like, g_cam)

        cam_up, opt_camera = opt_cam.update(g_cam, state.opt_camera, state.camera)
        camera = optax.apply_updates(state.camera, cam_up)

        mask = _encoder_trainable_mask(
            state.encoder["params"], encoder.stage_sizes[0]
        )
        g_enc = jax.tree_util.tree_map(lambda g, m: g * m, g_enc, mask)
        enc_up, opt_encoder = opt_enc.update(
            g_enc, state.opt_encoder, state.encoder["params"]
        )
        enc_params = optax.apply_updates(state.encoder["params"], enc_up)
        # Frozen stages also keep their BN statistics (torch eval() on
        # frozen children is implicit in never updating them).
        encoder_vars = dict(state.encoder)
        encoder_vars["params"] = enc_params
        encoder_vars["batch_stats"] = enc_mut["batch_stats"]

        dec_up, opt_decoder = opt_dec.update(g_dec, state.opt_decoder, state.decoder)
        dec_params = optax.apply_updates(state.decoder, dec_up)

        new_state = state.replace(
            camera=camera,
            encoder=encoder_vars,
            decoder=dec_params,
            opt_camera=opt_camera,
            opt_encoder=opt_encoder,
            opt_decoder=opt_decoder,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step
