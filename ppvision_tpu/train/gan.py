"""Face-DeId GAN trainer: the reference Solver as one jitted step.

Reproduces the training dance of ``Face-DeId/core/solver.py:107-248``
exactly — per iteration, sequentially:

1. privacy image from the (frozen) camera, heatmap masks from the
   (frozen) ``fan_priv``;
2. discriminator step on latent-style fakes (R1 on real refs);
3. discriminator step on reference-style fakes;
4. generator step from latent styles (updates G, mapping, style
   encoder; + flow loss, + value-only heatmap L1);
5. generator step from reference styles (updates G only; + LPIPS,
   + flow);
6. EMA lerp (beta 0.999) of G/mapping/style-encoder.

TPU-first structure: the whole iteration is ONE jitted function
(per-net optax optimizers applied sequentially inside), so XLA fuses
across sub-steps and a data-parallel mesh shards the batch axis without
host round-trips.  R1 is grad-of-grad under jit (solver.py:379-388).

The reference computes its heatmap-L1 (and the fake-side heatmaps)
under ``torch.no_grad`` — they contribute value but no gradient
(wing.py:241 ``@torch.no_grad``); we keep that exact semantics with
``stop_gradient``.  The cycle branch's fan call whose masks are then
discarded (solver.py:355-357 passes ``masks=None``) is dead compute and
is not reproduced.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import FaceDeIdConfig
from ..models.fan import FAN, get_heatmap
from ..models.stargan import build_gan_models
from ..ops.image import resize_bilinear
from ..optics.camera import CameraConstants, CameraParams, camera_apply

GAN_NETS = ("generator", "mapping_network", "style_encoder", "discriminator")
EMA_NETS = ("generator", "mapping_network", "style_encoder")


class GANTrainState(struct.PyTreeNode):
    params: dict[str, Any]
    opt_states: dict[str, Any]
    ema_params: dict[str, Any]
    step: jnp.ndarray


@struct.dataclass
class FrozenNets:
    """Non-trained components used inside the train step."""

    camera_params: CameraParams
    camera_consts: CameraConstants
    fan_params: Any  # pretrained FAN (clean images)
    fan_priv_params: Any  # FAN trained on privacy images


def make_optimizers(cfg: FaceDeIdConfig) -> dict[str, optax.GradientTransformation]:
    """Adam with torch-style (pre-moment) weight decay; mapping network
    uses the slow f_lr (solver.py:60-67)."""

    def adam(lr):
        return optax.chain(
            optax.add_decayed_weights(cfg.train.weight_decay),
            optax.scale_by_adam(b1=cfg.train.beta1, b2=cfg.train.beta2),
            optax.scale(-lr),
        )

    return {
        net: adam(cfg.train.f_lr if net == "mapping_network" else cfg.train.lr)
        for net in GAN_NETS
    }


def init_gan(
    key: jax.Array, cfg: FaceDeIdConfig
) -> tuple[dict[str, Any], FAN, GANTrainState]:
    """Build modules, init params + EMA copies + optimizer states."""
    dtype = jnp.dtype(cfg.model.compute_dtype)
    models = build_gan_models(
        img_size=cfg.model.img_size,
        style_dim=cfg.model.style_dim,
        latent_dim=cfg.model.latent_dim,
        num_domains=cfg.model.num_domains,
        w_hpf=cfg.model.w_hpf,
        max_conv_dim=cfg.model.max_conv_dim,
        dtype=dtype,
    )
    kg, km, ke, kd = jax.random.split(key, 4)
    n = cfg.model.img_size
    x = jnp.zeros((1, n, n, 3))
    s = jnp.zeros((1, cfg.model.style_dim))
    z = jnp.zeros((1, cfg.model.latent_dim))
    y = jnp.zeros((1,), dtype=jnp.int32)
    masks = (jnp.zeros((1, 256, 256, 1)), jnp.zeros((1, 256, 256, 1)))
    params = {
        "generator": models["generator"].init(kg, x, s, masks)["params"],
        "mapping_network": models["mapping_network"].init(km, z, y)["params"],
        "style_encoder": models["style_encoder"].init(ke, x, y)["params"],
        "discriminator": models["discriminator"].init(kd, x, y)["params"],
    }
    optims = make_optimizers(cfg)
    opt_states = {k: optims[k].init(params[k]) for k in GAN_NETS}
    ema = {k: jax.tree_util.tree_map(jnp.copy, params[k]) for k in EMA_NETS}
    state = GANTrainState(
        params=params, opt_states=opt_states, ema_params=ema, step=jnp.zeros((), jnp.int32)
    )
    return models, FAN(dtype=dtype), state


def adv_loss(logits: jnp.ndarray, target: int) -> jnp.ndarray:
    """BCE-with-logits against a constant target (solver.py:372-376)."""
    if target == 1:
        return jnp.mean(jax.nn.softplus(-logits))
    return jnp.mean(jax.nn.softplus(logits))


def lambda_ds_schedule(cfg: FaceDeIdConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Linear decay of the diversity weight to 0 over ds_iter
    (solver.py:127-134, 192-193)."""
    # result_type(float): f64 under jax_enable_x64 (the f64 dynamics
    # golden), f32 otherwise — matching the reference's python-float
    # lambda_ds bookkeeping (solver.py:192-193) at either precision.
    frac = 1.0 - step.astype(jnp.result_type(float)) / float(cfg.loss.ds_iter)
    return cfg.loss.lambda_ds * jnp.clip(frac, 0.0, 1.0)


def make_train_step(
    models: dict[str, Any],
    fan: FAN,
    cfg: FaceDeIdConfig,
    lpips_fn: Callable | None = None,
    flow_fn: Callable | None = None,
):
    """Build the jitted per-iteration update.

    ``lpips_fn(x, y) -> scalar`` and ``flow_fn(a, b) -> scalar`` plug in
    the LPIPS and RAFT-flow losses once those models are constructed;
    when None the corresponding terms are zero.
    """
    optims = make_optimizers(cfg)
    gen, mapn, senc, disc = (models[k] for k in GAN_NETS)

    def g_apply(p, x, s, masks):
        return gen.apply({"params": p}, x, s, masks)

    def d_apply(p, x, y):
        return disc.apply({"params": p}, x, y)

    if cfg.train.remat:
        # Recompute G/D activations in the backward pass instead of
        # storing them: same values, ~1 extra forward of FLOPs, and the
        # step's peak HBM drops by the large fake/feature activations
        # (cfg.train.remat; equivalence: test_train_gan.py).  R1's
        # grad-of-grad differentiates through the checkpoint fine.
        g_apply = jax.checkpoint(g_apply)
        d_apply = jax.checkpoint(d_apply)

    def d_loss_fn(d_params, params, x_real, y_trg, style, masks, x_real_org):
        # Real branch + R1 penalty on the real reference images
        # (solver passes x_real_org=x_ref, solver.py:150-158, 292-304).
        def d_sum(x):
            return jnp.sum(d_apply(d_params, x, y_trg))

        loss_real = adv_loss(d_apply(d_params, x_real_org, y_trg), 1)
        grad_x = jax.grad(d_sum)(x_real_org)
        reg = 0.5 * jnp.mean(jnp.sum(grad_x**2, axis=(1, 2, 3)))
        # Fake branch, generator frozen (torch.no_grad, solver.py:306-312).
        x_fake = jax.lax.stop_gradient(
            g_apply(params["generator"], x_real, style, masks)
        )
        loss_fake = adv_loss(d_apply(d_params, x_fake, y_trg), 0)
        loss = loss_real + loss_fake + cfg.loss.lambda_reg * reg
        return loss, dict(real=loss_real, fake=loss_fake, reg=reg)

    def g_loss_fn(
        g_params, m_params, e_params, params, x_real, y_org, y_trg,
        styles_from, lam_ds, masks,
    ):
        """compute_g_loss (solver.py:322-364); ``styles_from`` yields the
        two target styles (latent or reference flavor)."""
        s_trg, s_trg2 = styles_from(m_params, e_params)
        x_fake = g_apply(g_params, x_real, s_trg, masks)
        loss_adv = adv_loss(d_apply(params["discriminator"], x_fake, y_trg), 1)
        s_pred = senc.apply({"params": e_params}, x_fake, y_trg)
        loss_sty = cfg.loss.lambda_sty * jnp.mean(jnp.abs(s_pred - s_trg))
        x_fake2 = jax.lax.stop_gradient(g_apply(g_params, x_real, s_trg2, masks))
        loss_ds = lam_ds * jnp.mean(jnp.abs(x_fake - x_fake2))
        s_org = senc.apply({"params": e_params}, x_real, y_org)
        x_rec = g_apply(g_params, x_fake, s_org, None)
        loss_cyc = cfg.loss.lambda_cyc * jnp.mean(jnp.abs(x_rec - x_real))
        loss = loss_adv + loss_sty - loss_ds + loss_cyc
        aux = dict(adv=loss_adv, sty=loss_sty, ds=loss_ds, cyc=loss_cyc)
        return loss, (aux, x_fake)

    def apply_update(net, params_net, opt_state, grads):
        updates, new_opt = optims[net].update(grads, opt_state, params_net)
        return optax.apply_updates(params_net, updates), new_opt

    @jax.jit
    def train_step(state: GANTrainState, frozen: FrozenNets, batch: dict):
        params = dict(state.params)
        opt_states = dict(state.opt_states)
        metrics = {}

        x_src, y_src = batch["x_src"], batch["y_src"]
        x_ref, x_ref2, y_trg = batch["x_ref"], batch["x_ref2"], batch["y_ref"]
        z_trg, z_trg2 = batch["z_trg"], batch["z_trg2"]

        # Frozen camera + privacy heatmaps (solver.py:144-147).  A
        # batch may carry precomputed private images instead ("x_priv"
        # — the reference's paired Org/Priv lab-image datasets,
        # data_loader.py:23-49); then the camera is skipped.
        if "x_priv" in batch:
            x_real = batch["x_priv"]
        else:
            x_real, _ = camera_apply(
                frozen.camera_params, frozen.camera_consts, x_src
            )
        x_real = jax.lax.stop_gradient(x_real)
        masks = get_heatmap(fan, frozen.fan_priv_params, x_real, privacy=True,
                            input_size=cfg.model.fan_input_size)
        masks = jax.lax.stop_gradient(masks)

        lam_ds = lambda_ds_schedule(cfg, state.step)

        # --- D step (latent styles) ---
        s_lat = jax.lax.stop_gradient(
            mapn.apply({"params": params["mapping_network"]}, z_trg, y_trg)
        )
        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            params["discriminator"], params, x_real, y_trg, s_lat, masks, x_ref
        )
        params["discriminator"], opt_states["discriminator"] = apply_update(
            "discriminator", params["discriminator"], opt_states["discriminator"], d_grads
        )
        metrics.update({f"D/latent_{k}": v for k, v in d_aux.items()})

        # --- D step (reference styles) ---
        s_ref = jax.lax.stop_gradient(
            senc.apply({"params": params["style_encoder"]}, x_ref, y_trg)
        )
        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            params["discriminator"], params, x_real, y_trg, s_ref, masks, x_ref
        )
        params["discriminator"], opt_states["discriminator"] = apply_update(
            "discriminator", params["discriminator"], opt_states["discriminator"], d_grads
        )
        metrics.update({f"D/ref_{k}": v for k, v in d_aux.items()})

        # --- G step (latent styles): updates G, mapping, style encoder ---
        def latent_styles(mp, ep):
            return (
                mapn.apply({"params": mp}, z_trg, y_trg),
                mapn.apply({"params": mp}, z_trg2, y_trg),
            )

        def g_total_latent(gp, mp, ep):
            loss, (aux, x_fake) = g_loss_fn(
                gp, mp, ep, params, x_real, y_src, y_trg, latent_styles, lam_ds, masks
            )
            if flow_fn is not None:
                hm = get_heatmap(fan, frozen.fan_params, x_src, delimiter=True,
                                 input_size=cfg.model.fan_input_size)[0]
                hm = resize_bilinear(hm, x_src.shape[1:3])
                mask_org = (hm > 0.5).astype(x_src.dtype)
                flow = flow_fn(x_src * mask_org * 255.0, x_fake * mask_org * 255.0)
                flow = flow * cfg.loss.lambda_flow
                loss = loss + flow
                aux["flow"] = flow
            # Heatmap L1: value-only (both sides no-grad in the reference).
            if cfg.loss.lambda_heatmap:
                mf = get_heatmap(fan, frozen.fan_params, x_fake, privacy=False,
                                 input_size=cfg.model.fan_input_size)[0]
                hm_l1 = jax.lax.stop_gradient(
                    jnp.mean(jnp.abs(mf - masks[0])) * cfg.loss.lambda_heatmap
                )
                aux["heatmap_l1"] = hm_l1
                loss = loss + hm_l1
            return loss, aux

        (_, g_aux), g_grads = jax.value_and_grad(
            g_total_latent, argnums=(0, 1, 2), has_aux=True
        )(params["generator"], params["mapping_network"], params["style_encoder"])
        for net, grad in zip(("generator", "mapping_network", "style_encoder"), g_grads):
            params[net], opt_states[net] = apply_update(
                net, params[net], opt_states[net], grad
            )
        metrics.update({f"G/latent_{k}": v for k, v in g_aux.items()})

        # --- G step (reference styles): updates G only ---
        def ref_styles(mp, ep):
            return (
                senc.apply({"params": ep}, x_ref, y_trg),
                senc.apply({"params": ep}, x_ref2, y_trg),
            )

        def g_total_ref(gp):
            loss, (aux, x_fake) = g_loss_fn(
                gp,
                params["mapping_network"],
                params["style_encoder"],
                params, x_real, y_src, y_trg, ref_styles, lam_ds, masks,
            )
            if lpips_fn is not None:
                lp = jnp.abs(lpips_fn(x_ref, x_fake)) * cfg.loss.lambda_lpips
                loss = loss + lp
                aux["lpips"] = lp
            if flow_fn is not None:
                hm = get_heatmap(fan, frozen.fan_params, x_src, delimiter=True,
                                 input_size=cfg.model.fan_input_size)[0]
                hm = resize_bilinear(hm, x_src.shape[1:3])
                mask_org = (hm > 0.5).astype(x_src.dtype)
                flow = flow_fn(x_src * mask_org * 255.0, x_fake * mask_org * 255.0)
                flow = flow * cfg.loss.lambda_flow
                loss = loss + flow
                aux["flow"] = flow
            return loss, aux

        (_, g_aux), g_grad = jax.value_and_grad(g_total_ref, has_aux=True)(
            params["generator"]
        )
        params["generator"], opt_states["generator"] = apply_update(
            "generator", params["generator"], opt_states["generator"], g_grad
        )
        metrics.update({f"G/ref_{k}": v for k, v in g_aux.items()})

        # --- EMA (solver.py:187-189, 367-369) ---
        beta = cfg.train.ema_beta
        ema = {
            net: jax.tree_util.tree_map(
                lambda p, e: p + beta * (e - p), params[net], state.ema_params[net]
            )
            for net in EMA_NETS
        }
        metrics["G/lambda_ds"] = lam_ds

        return (
            state.replace(
                params=params, opt_states=opt_states, ema_params=ema, step=state.step + 1
            ),
            metrics,
        )

    return train_step
