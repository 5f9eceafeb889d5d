"""Face-DeId CLI: train / sample / eval (reference ``main.py`` modes).

Usage:
    python -m ppvision_tpu.cli.main --mode train --train_img_dir ... --ref_dir ...
    python -m ppvision_tpu.cli.main --mode sample --src_dir ... --ref_dir ...
    python -m ppvision_tpu.cli.main --mode eval --val_img_dir ...

Flags mirror the reference argparse surface (main.py:86-198); values
default to the reference recipe via the typed config tree.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ..config import FaceDeIdConfig

    cfg = FaceDeIdConfig()
    p = argparse.ArgumentParser(description="TPU-native Face-DeId")
    p.add_argument("--mode", required=True, choices=["train", "sample", "eval", "align"])
    p.add_argument("--inp_dir", default="", help="input dir for --mode align")
    p.add_argument("--out_dir", default="", help="output dir for --mode align")
    for section in ("model", "loss", "train", "camera", "paths"):
        sub = getattr(cfg, section)
        for f in dataclasses.fields(sub):
            flag = f"--{f.name}"
            default = getattr(sub, f.name)
            if isinstance(default, bool):
                p.add_argument(flag, type=lambda s: s.lower() in ("1", "true"), default=default)
            elif isinstance(default, (int, float, str)):
                p.add_argument(flag, type=type(default), default=default)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--num_sample_batches", type=int, default=1)
    p.add_argument(
        "--video", action="store_true",
        help="with --mode sample: treat src_dir as a frame sequence; "
        "write de-id + interpolation videos and a flow-consistency score",
    )
    p.add_argument(
        "--allow_random_metrics", action="store_true",
        help="let --mode eval run with random-weight metric nets "
        "(relative comparisons only; published numbers need converted ckpts)",
    )
    p.add_argument(
        "--aligned_face_id", action="store_true",
        help="with --mode eval: insightface-comparable face-ID cosines "
        "(FAN landmarks -> ArcFace-template warp; needs wing ckpt)",
    )
    return p


def config_from_args(args) -> "FaceDeIdConfig":
    from ..config import (
        CameraConfig,
        FaceDeIdConfig,
        LossConfig,
        ModelConfig,
        ParallelConfig,
        PathsConfig,
        TrainConfig,
    )

    def fill(cls):
        return cls(**{
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(cls)
            if hasattr(args, f.name)
        })

    return FaceDeIdConfig(
        model=fill(ModelConfig),
        loss=fill(LossConfig),
        train=fill(TrainConfig),
        camera=fill(CameraConfig),
        paths=fill(PathsConfig),
        parallel=ParallelConfig(),
    )


def run_train(cfg, use_wandb: bool = False) -> None:
    import os

    from ..data.face import FaceBatcher
    from ..parallel.mesh import (
        initialize_multihost,
        is_primary,
        local_batch_size,
        make_mesh,
        replicate_pytree,
        shard_batch,
    )
    from ..train.gan import init_gan, make_train_step
    from ..train.pretrained import build_aux_losses, load_frozen_nets
    from ..utils.checkpoint import StepCheckpoints
    from ..utils.logging import MetricWriter

    # Join a multi-host job when one is configured (auto-detect; no-op
    # for single-process runs).  Must precede every jax op below.
    initialize_multihost()
    key = jax.random.key(cfg.train.seed)
    models, fan, state = init_gan(key, cfg)
    # Pretrained camera + wing FAN + fan_priv decoder (solver.py:44-48, 99).
    frozen = load_frozen_nets(cfg, fan, jax.random.key(1))
    ckpts = StepCheckpoints(cfg.paths.checkpoint_save_dir)

    # Resume (solver.py:92-134): restore nets/EMA/optims at resume_iter,
    # or at the latest saved step when resume_iter == 0.  The lambda_ds
    # re-derivation is automatic — the schedule reads state.step.
    start = cfg.train.resume_iter or (ckpts.latest_step("nets") or 0)
    if start and os.path.exists(ckpts.path(start, "nets")):
        state = state.replace(
            params=ckpts.load(start, "nets", target=state.params),
            ema_params=ckpts.load(start, "nets_ema", target=state.ema_params),
            opt_states=ckpts.load(start, "optims", target=state.opt_states),
            step=jnp.asarray(start, jnp.int32),
        )
        print(f"Resumed training from step {start}")
    else:
        if start:
            print(f"No checkpoint at step {start} in {ckpts.root}; trying warm start")
            start = 0
        # Reference warm-start semantics (solver.py:92-99): load nets
        # from checkpoint_dir / a reference torch ckpt, save elsewhere.
        from ..train.pretrained import warm_start_state

        state, _ = warm_start_state(state, cfg)

    # Full paper loss: LPIPS x2000 + RAFT flow x10 (solver.py:161-184).
    lpips_fn, flow_fn = build_aux_losses(cfg, jax.random.key(2))
    step_fn = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=flow_fn)

    # Data parallelism: batch sharded over the mesh's data axis,
    # params/EMA/optimizer state replicated; XLA inserts the gradient
    # all-reduces (the TPU-native nn.DataParallel, model.py:281-308).
    mesh = make_mesh(axis_names=(cfg.parallel.data_axis,))
    state = replicate_pytree(mesh, state)
    frozen = replicate_pytree(mesh, frozen)

    # Rank-0-only observability + checkpointing: every process runs the
    # identical SPMD step, but only the primary writes (concurrent
    # orbax rmtree+save from N processes would corrupt state — the
    # reference's vestigial gpu_rank==0 gating, Camera/Utils.py:15).
    primary = is_primary()
    writer = (
        MetricWriter(cfg.paths.checkpoint_save_dir, use_wandb, cfg.train.print_every)
        if primary
        else None
    )
    batcher = FaceBatcher(
        cfg.paths.train_img_dir,
        cfg.paths.ref_dir,
        img_size=cfg.model.img_size,
        batch_size=cfg.train.batch_size,
        latent_dim=cfg.model.latent_dim,
        crop_prob=cfg.train.randcrop_prob,
        seed=cfg.train.seed,
    )
    from ..utils.debug import make_debug_forward, save_debug_grid

    debug_fwd = None
    print(f"Start training on {len(mesh.devices.flat)} device(s)...")
    for i in range(start, cfg.train.total_iters):
        batch = shard_batch(
            mesh, next(batcher), axis=cfg.parallel.data_axis,
            local_batch=local_batch_size(cfg.train.batch_size),
        )
        state, metrics = step_fn(state, frozen, batch)
        if writer is not None:
            writer.write(i + 1, metrics)
        if (
            primary
            and jax.process_count() == 1  # grid needs every shard host-side
            and cfg.train.debug_every
            and (i + 1) % cfg.train.debug_every == 0
        ):
            # The reference's 10-panel grid (solver.py:216-248).
            if debug_fwd is None:
                debug_fwd = make_debug_forward(models, fan, cfg)
            images, heats = debug_fwd(state.params, frozen, batch)
            save_debug_grid(
                images, heats, os.path.join(cfg.paths.debug_dir, f"Img_{i + 1}.svg")
            )
        if primary and (i + 1) % cfg.train.save_every == 0:
            ckpts.save(i + 1, "nets", state.params)
            ckpts.save(i + 1, "nets_ema", state.ema_params)
            ckpts.save(i + 1, "optims", state.opt_states)
            ckpts.save(i + 1, "camera", frozen.camera_params)
    batcher.close()


def run_sample(cfg, num_batches: int = 1, video: bool = False) -> None:
    from ..data.face import eval_batches
    from ..deid import build_deid
    from ..sample import translate_using_reference
    from ..train.pretrained import restore_deid_params

    bundle = build_deid(jax.random.key(cfg.train.seed), cfg)
    bundle = bundle._replace(params=restore_deid_params(bundle, cfg))
    if video:
        return run_video(cfg, bundle)
    srcs = eval_batches(cfg.paths.src_dir, cfg.model.img_size, cfg.train.val_batch_size)
    refs = eval_batches(cfg.paths.ref_dir, cfg.model.img_size, cfg.train.val_batch_size)
    for i, (src, ref) in enumerate(zip(srcs, refs)):
        if i >= num_batches:
            break
        y_ref = jnp.zeros((ref.shape[0],), jnp.int32)
        print(f"Working on batch {i}...")
        translate_using_reference(
            bundle, bundle.params, jnp.asarray(src), jnp.asarray(ref), y_ref,
            out_dir=cfg.paths.result_dir, tag=i,
        )


def run_video(cfg, bundle) -> None:
    """Video de-id (BASELINE config 5): treat src_dir's sorted frames as
    a sequence, anonymize each with one fixed reference style, write an
    mp4 + a reference-interpolation video, and report RAFT temporal
    flow-consistency (reference core/utils.py:259-425 + loss_RAFT)."""
    import os

    from ..data.face import eval_batches
    from ..deid import deid_from_reference
    from ..sample import video_ref, write_video

    out_dir = cfg.paths.result_dir
    os.makedirs(out_dir, exist_ok=True)
    srcs = np.concatenate(
        list(eval_batches(cfg.paths.src_dir, cfg.model.img_size, cfg.train.val_batch_size))
    )
    refs = np.concatenate(
        list(eval_batches(cfg.paths.ref_dir, cfg.model.img_size, cfg.train.val_batch_size))
    )
    # Fixed style from the first reference face for the whole sequence.
    fn = jax.jit(lambda p, xs, xr, yr: deid_from_reference(bundle, p, xs, xr, yr))
    ref0 = jnp.broadcast_to(jnp.asarray(refs[:1]), srcs.shape)
    y = jnp.zeros((srcs.shape[0],), jnp.int32)
    fakes = np.asarray(fn(bundle.params, jnp.asarray(srcs), ref0, y))
    seq_path = os.path.join(out_dir, "video_deid.mp4")
    write_video(fakes, seq_path)
    print(f"Wrote de-id sequence video to {seq_path}")

    # Style-interpolation showcase video (utils.py:310-341).
    n = min(8, srcs.shape[0], refs.shape[0])
    interp_path = os.path.join(out_dir, "video_ref.mp4")
    video_ref(
        bundle, bundle.params,
        jnp.asarray(srcs[:n]), jnp.asarray(refs[: max(n, 2)]),
        jnp.zeros((max(n, 2),), jnp.int32), interp_path,
    )
    print(f"Wrote interpolation video to {interp_path}")

    # Temporal consistency of the anonymized sequence vs the source.
    if srcs.shape[0] >= 2:
        from ..metrics.temporal import flow_consistency
        from ..models.raft import RAFT
        from ..train.pretrained import warn_random_init

        # Pyramid depth must fit the 1/8-res feature map (tiny frames in
        # tests; real frames use the full 4 levels).
        fmap = max(cfg.model.img_size // 8, 1)
        corr_levels = max(1, min(4, int(np.log2(fmap)) + 1))
        raft = RAFT(corr_levels=corr_levels)
        if os.path.exists(cfg.paths.raft_path):
            from ..utils.torch_import import raft_params_from_torch, load_torch_state_dict

            rp = jax.tree_util.tree_map(
                jnp.asarray,
                raft_params_from_torch(load_torch_state_dict(cfg.paths.raft_path)),
            )
        else:
            warn_random_init("RAFT (raft-things.pth)", cfg.paths.raft_path)
            rp = raft.init(
                jax.random.key(0),
                jnp.zeros((1, cfg.model.img_size, cfg.model.img_size, 3)),
                jnp.zeros((1, cfg.model.img_size, cfg.model.img_size, 3)),
                iters=1,
            )["params"]
        score = flow_consistency(raft, rp, jnp.asarray(srcs), jnp.asarray(fakes))
        print(f"flow_consistency_epe: {score:.4f}")


def run_eval(
    cfg, allow_random_metrics: bool = False, aligned_face_id: bool = False
) -> None:
    from ..deid import build_deid
    from ..metrics.eval_gan import calculate_metrics, load_metric_nets
    from ..train.pretrained import restore_deid_params

    if aligned_face_id:
        # insightface-comparable cosines need clean wing-FAN landmarks
        # (metrics/face_id.py::make_aligned_embed_fn).  Checked before
        # the bundle build so a missing ckpt fails in ms, not minutes.
        import os

        if not os.path.exists(cfg.paths.wing_path):
            raise FileNotFoundError(
                f"--aligned_face_id needs the wing FAN checkpoint at "
                f"{cfg.paths.wing_path} (clean-image landmarks)"
            )
    bundle = build_deid(jax.random.key(cfg.train.seed), cfg)
    bundle = bundle._replace(params=restore_deid_params(bundle, cfg))
    metric_nets = load_metric_nets(cfg.paths)
    align_fan_params = None
    if aligned_face_id:
        from ..utils.torch_import import fan_params_from_torch, load_torch_state_dict

        align_fan_params = jax.tree_util.tree_map(
            jnp.asarray,
            fan_params_from_torch(load_torch_state_dict(cfg.paths.wing_path)),
        )
    for mode in ("latent", "reference"):
        res = calculate_metrics(
            bundle, bundle.params, cfg.paths.val_img_dir, mode=mode,
            num_outs=cfg.train.num_outs_per_domain, out_dir=cfg.paths.eval_dir,
            allow_random_metrics=allow_random_metrics,
            align_fan_params=align_fan_params, **metric_nets,
        )
        for k, v in res.items():
            print(f"{k}: {v:.4f}")


def run_align(cfg, inp_dir: str, out_dir: str) -> None:
    """Align faces to the CelebA mean frame (reference align_faces,
    wing.py:446-467).  Needs celeba_lm_mean.npz and a FAN checkpoint."""
    import os

    from PIL import Image

    from ..models.align import FaceAligner
    from ..models.fan import FAN

    fan = FAN()
    fan_params = fan.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))["params"]
    if os.path.exists(cfg.paths.wing_path):
        from ..utils.torch_import import fan_params_from_torch, load_torch_state_dict

        fan_params = jax.tree_util.tree_map(
            jnp.asarray, fan_params_from_torch(load_torch_state_dict(cfg.paths.wing_path))
        )
    mean_lm = np.load(cfg.paths.lm_path)["mean"] if os.path.exists(cfg.paths.lm_path) else (
        np.tile([[128.0, 128.0]], (98, 1))
    )
    aligner = FaceAligner(fan, fan_params, mean_lm, cfg.model.img_size)
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(inp_dir)):
        img = Image.open(os.path.join(inp_dir, fname)).convert("RGB")
        img = img.resize((cfg.model.img_size,) * 2, Image.BILINEAR)
        x = np.asarray(img, np.float32)[None] / 255.0 * 2.0 - 1.0
        aligned = aligner.align(x)[0]
        out = np.clip((aligned * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(out).save(os.path.join(out_dir, fname))
        print(f"Saved the aligned image to {fname}...")


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    np.random.seed(cfg.train.seed)
    if args.mode == "train":
        run_train(cfg, args.use_wandb)
    elif args.mode == "sample":
        run_sample(cfg, args.num_sample_batches, video=args.video)
    elif args.mode == "align":
        run_align(cfg, args.inp_dir, args.out_dir)
    else:
        run_eval(cfg, args.allow_random_metrics, args.aligned_face_id)


if __name__ == "__main__":
    main()
