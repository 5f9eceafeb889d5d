"""Pretrained-weight wiring: checkpoints -> frozen nets, aux losses,
and restorable de-id parameters.

The reference Solver loads several pretrained artifacts at init and the
CLI must reach them (Face-DeId/core/solver.py:44-48, 92-104;
core/model.py:298):

- ``Model_wing.pth`` — ``{'Camera': camera state, 'Decoder': fan_priv
  state}``; camera loaded strict at init (solver.py:46-48), fan_priv
  decoder loaded in ``_load_checkpoint`` (solver.py:99);
- ``wing.ckpt`` — the clean-image FAN (model.py:298);
- ``lpips_weights.ckpt`` (+ torchvision alexnet) — LPIPS
  (metrics/lpips.py:39-60);
- ``raft-things.pth`` — the flow loss net (core/utils.py:437-458).

Each loader falls back to a fresh random init with a LOUD warning when
the artifact is absent, so smoke tests run anywhere but a silent
"trains a different model than the paper" state is impossible.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FaceDeIdConfig

__all__ = [
    "load_frozen_nets",
    "build_aux_losses",
    "restore_deid_params",
    "warn_random_init",
]


def warn_random_init(what: str, path: str) -> None:
    print(
        f"WARNING: {what} checkpoint not found at {path!r} — using RANDOM "
        "init. Results will NOT match the paper.",
        file=sys.stderr,
    )


def _load_camera_and_fanpriv(cfg: FaceDeIdConfig, fan, key: jax.Array):
    """Camera params + fan_priv params, from Model_wing.pth when present.

    The torch artifact is ``{'Camera': state_dict, 'Decoder':
    state_dict}`` (solver.py:87-90 saves the same shape).
    """
    from ..optics.camera import CameraSpec, init_camera_params

    spec = CameraSpec(n=cfg.model.img_size, zernike_terms=cfg.camera.zernike_terms)
    fan_priv = fan.init(key, jnp.zeros((1, 256, 256, 3)))["params"]
    camera = init_camera_params(jax.random.fold_in(key, 1), spec)
    path = cfg.paths.camera_ckpt
    if path and os.path.exists(path):
        import torch

        from ..utils.torch_import import camera_params_from_torch, fan_params_from_torch

        obj = torch.load(path, map_location="cpu", weights_only=False)

        def flat(sub):
            sd = sub.state_dict() if hasattr(sub, "state_dict") else sub
            return {
                k.replace("module.", ""): v.detach().cpu().numpy()
                for k, v in sd.items()
                if hasattr(v, "numpy")
            }

        if "Camera" in obj:
            camera = camera_params_from_torch(flat(obj["Camera"]))
        # fan_priv decoder: the reference loads it into nets_ema.fan_priv,
        # which IS nets.fan_priv (same module object, model.py:304-308).
        for k in ("Decoder", "Mask"):
            if k in obj:
                fan_priv = fan_params_from_torch(flat(obj[k]))
                break
    else:
        warn_random_init("camera+fan_priv (Model_wing.pth)", path)
    return camera, fan_priv


def _load_fan(cfg: FaceDeIdConfig, fan, key: jax.Array):
    """Clean-image FAN from wing.ckpt (model.py:298)."""
    params = fan.init(key, jnp.zeros((1, 256, 256, 3)))["params"]
    path = cfg.paths.wing_path
    if path and os.path.exists(path):
        from ..utils.torch_import import fan_params_from_torch, load_torch_state_dict

        params = fan_params_from_torch(load_torch_state_dict(path))
    else:
        warn_random_init("FAN (wing.ckpt)", path)
    return params


def load_frozen_nets(cfg: FaceDeIdConfig, fan, key: jax.Array):
    """Build FrozenNets with pretrained camera/FAN/fan_priv when the
    checkpoint files exist (reference solver.py:44-48, 99)."""
    from ..optics.camera import CameraSpec, make_camera_constants
    from .gan import FrozenNets

    spec = CameraSpec(n=cfg.model.img_size, zernike_terms=cfg.camera.zernike_terms)
    camera, fan_priv = _load_camera_and_fanpriv(cfg, fan, jax.random.fold_in(key, 0))
    fan_params = _load_fan(cfg, fan, jax.random.fold_in(key, 2))
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    return FrozenNets(
        camera_params=as_jnp(camera),
        camera_consts=make_camera_constants(spec),
        fan_params=as_jnp(fan_params),
        fan_priv_params=as_jnp(fan_priv),
    )


def build_aux_losses(
    cfg: FaceDeIdConfig, key: jax.Array
) -> tuple[Callable | None, Callable | None]:
    """LPIPS and RAFT-flow loss closures per the config, with imported
    weights when the artifacts exist (solver.py:32-33)."""
    from .aux_losses import build_flow_fn, build_lpips_fn

    lpips_fn = flow_fn = None
    if cfg.train.use_lpips:
        params = None
        lp, ap = cfg.paths.lpips_path, cfg.paths.alexnet_path
        if os.path.exists(lp) and os.path.exists(ap):
            from ..utils.torch_import import lpips_params_from_torch, load_torch_state_dict

            params = jax.tree_util.tree_map(
                jnp.asarray,
                lpips_params_from_torch(load_torch_state_dict(ap), load_torch_state_dict(lp)),
            )
        else:
            warn_random_init("LPIPS (alexnet + lpips_weights)", f"{ap} / {lp}")
        lpips_fn, _ = build_lpips_fn(
            cfg.model.img_size, params=params, key=jax.random.fold_in(key, 3)
        )
    if cfg.train.use_flow:
        params = None
        if os.path.exists(cfg.paths.raft_path):
            from ..utils.torch_import import raft_params_from_torch, load_torch_state_dict

            params = jax.tree_util.tree_map(
                jnp.asarray, raft_params_from_torch(load_torch_state_dict(cfg.paths.raft_path))
            )
        else:
            warn_random_init("RAFT (raft-things.pth)", cfg.paths.raft_path)
        # Pyramid depth must fit the 1/8-res feature map (reference
        # trains at 256^2 where 4 levels fit; tiny test images need less).
        fmap = max(cfg.model.img_size // 8, 1)
        corr_levels = max(1, min(4, int(np.log2(fmap)) + 1))
        flow_fn, _ = build_flow_fn(
            params=params,
            key=jax.random.fold_in(key, 4),
            iters=cfg.train.flow_iters,
            image_size=cfg.model.img_size,
            corr_levels=corr_levels,
        )
    return lpips_fn, flow_fn


def _import_torch_gan_nets(path: str, cfg: FaceDeIdConfig) -> dict[str, Any]:
    """Reference '{:06d}_nets(.ema).ckpt' -> dict of converted param trees
    for whichever of G/M/E/D the file contains."""
    import torch

    from ..utils.torch_import import (
        discriminator_params_from_torch,
        generator_params_from_torch,
        mapping_params_from_torch,
        style_encoder_params_from_torch,
    )

    obj = torch.load(path, map_location="cpu", weights_only=False)

    def flat(name):
        sd = obj[name]
        sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
        return {
            k.replace("module.", ""): np.asarray(v.detach().cpu())
            for k, v in sd.items()
            if hasattr(v, "detach")
        }

    m, mx, nd = cfg.model.img_size, cfg.model.max_conv_dim, cfg.model.num_domains
    out: dict[str, Any] = {}
    conv = {
        "generator": lambda sd: generator_params_from_torch(
            sd, img_size=m, max_conv_dim=mx, w_hpf=cfg.model.w_hpf
        ),
        "mapping_network": lambda sd: mapping_params_from_torch(sd, num_domains=nd),
        "style_encoder": lambda sd: style_encoder_params_from_torch(
            sd, img_size=m, num_domains=nd, max_conv_dim=mx
        ),
        "discriminator": lambda sd: discriminator_params_from_torch(
            sd, img_size=m, num_domains=nd, max_conv_dim=mx
        ),
    }
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    for name, fn in conv.items():
        if name in obj:
            out[name] = as_jnp(fn(flat(name)))
    return out


def warm_start_state(state, cfg: FaceDeIdConfig):
    """Warm-start GAN training the way the reference does (solver.py:92-99):
    LOAD from ``cfg.paths.checkpoint_dir`` (orbax groups, or a reference
    torch '{:06d}_nets.ckpt' via ``cfg.paths.torch_nets_ckpt``), then
    training SAVES to ``checkpoint_save_dir``.  Optimizer states start
    fresh; EMA copies the warm-started params when no EMA source exists.
    Returns (state, True) when something loaded.
    """
    from ..utils.checkpoint import StepCheckpoints

    # Orbax groups in checkpoint_dir (e.g. a previous run's save dir).
    if os.path.isdir(cfg.paths.checkpoint_dir):
        src = StepCheckpoints(cfg.paths.checkpoint_dir)
        step = src.latest_step("nets")
        if step is not None:
            params = src.load(step, "nets", target=state.params)
            ema = state.ema_params
            if os.path.exists(src.path(step, "nets_ema")):
                ema = src.load(step, "nets_ema", target=state.ema_params)
            print(f"Warm start from {cfg.paths.checkpoint_dir} step {step}")
            return state.replace(params=params, ema_params=ema), True

    tck = cfg.paths.torch_nets_ckpt
    if tck and os.path.exists(tck):
        nets = _import_torch_gan_nets(tck, cfg)
        params = dict(state.params)
        params.update({k: v for k, v in nets.items() if k in params})
        ema = {k: nets.get(k, params[k]) for k in state.ema_params}
        # A sibling '..._nets_ema.ckpt' provides the EMA copies when present.
        ema_path = tck.replace("_nets.ckpt", "_nets_ema.ckpt")
        if ema_path != tck and os.path.exists(ema_path):
            ema_nets = _import_torch_gan_nets(ema_path, cfg)
            ema.update({k: v for k, v in ema_nets.items() if k in ema})
        print(f"Warm start from reference checkpoint {tck}")
        return state.replace(params=params, ema_params=ema), True
    return state, False


def restore_deid_params(bundle, cfg: FaceDeIdConfig, step: int | None = None):
    """Restore DeIdParams for --mode sample/eval (VERDICT r1 item 6).

    Priority: (1) an explicit reference torch checkpoint
    (``cfg.paths.torch_nets_ckpt``, the '{:06d}_nets_ema.ckpt' format);
    (2) the latest (or ``step``) orbax 'nets_ema' + 'camera' groups under
    ``cfg.paths.checkpoint_save_dir``; (3) the bundle's random init, with
    a loud warning.  Camera/fan_priv additionally come from
    ``Model_wing.pth`` when present (as at train time).
    """
    from ..utils.checkpoint import StepCheckpoints

    params = bundle.params
    camera, fan_priv = _load_camera_and_fanpriv(cfg, bundle.fan, jax.random.key(0))
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    params = params.replace(camera=as_jnp(camera), fan_priv=as_jnp(fan_priv))

    tck = cfg.paths.torch_nets_ckpt
    if tck and os.path.exists(tck):
        from ..utils.torch_import import (
            generator_params_from_torch,
            load_torch_state_dict,
            mapping_params_from_torch,
            style_encoder_params_from_torch,
        )
        import torch

        obj = torch.load(tck, map_location="cpu", weights_only=False)

        def flat(name):
            sd = obj[name]
            return {
                k.replace("module.", ""): np.asarray(v.detach().cpu())
                for k, v in sd.items()
                if hasattr(v, "detach")
            }

        m, mx = cfg.model.img_size, cfg.model.max_conv_dim
        return params.replace(
            generator=as_jnp(
                generator_params_from_torch(
                    flat("generator"), img_size=m, max_conv_dim=mx, w_hpf=cfg.model.w_hpf
                )
            ),
            mapping_network=as_jnp(
                mapping_params_from_torch(
                    flat("mapping_network"), num_domains=cfg.model.num_domains
                )
            ),
            style_encoder=as_jnp(
                style_encoder_params_from_torch(
                    flat("style_encoder"),
                    img_size=m,
                    num_domains=cfg.model.num_domains,
                    max_conv_dim=mx,
                )
            ),
        )

    ckpts = StepCheckpoints(cfg.paths.checkpoint_save_dir)
    step = step if step is not None else ckpts.latest_step("nets_ema")
    if step is not None and os.path.exists(ckpts.path(step, "nets_ema")):
        ema = ckpts.load(
            step,
            "nets_ema",
            target={
                k: getattr(params, k)
                for k in ("generator", "mapping_network", "style_encoder")
            },
        )
        params = params.replace(**{k: as_jnp(v) for k, v in ema.items()})
        cam_path = ckpts.path(step, "camera")
        if os.path.exists(cam_path):
            params = params.replace(camera=ckpts.load(step, "camera", target=params.camera))
        print(f"Restored nets_ema from step {step} in {ckpts.root}")
    else:
        warn_random_init("GAN nets (orbax nets_ema)", cfg.paths.checkpoint_save_dir)
    return params
