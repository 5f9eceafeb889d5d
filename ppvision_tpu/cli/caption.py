"""Captioning CLI: preprocess / train / eval / heat (reference
``Image_Caption/{create_input_files,train,eval/*,Camera/Camera_heating}.py``).

Usage:
    python -m ppvision_tpu.cli.caption preprocess --karpathy_json ... --image_folder ...
    python -m ppvision_tpu.cli.caption train --data_folder ... --data_name coco_5_cap_per_img_5_min_word_freq
    python -m ppvision_tpu.cli.caption eval  --data_folder ... --split TEST
    python -m ppvision_tpu.cli.caption heat  --steps 5000
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _add_common(p):
    p.add_argument("--data_folder", default="data/caption")
    p.add_argument("--data_name", default="coco_5_cap_per_img_5_min_word_freq")
    p.add_argument("--out_dir", default="expr/caption")


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native privacy captioning")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("preprocess")
    pp.add_argument("--dataset", default="coco")
    pp.add_argument("--karpathy_json", required=True)
    pp.add_argument("--image_folder", required=True)
    pp.add_argument("--captions_per_image", type=int, default=5)
    pp.add_argument("--min_word_freq", type=int, default=5)
    pp.add_argument("--output_folder", default="data/caption")
    pp.add_argument("--max_len", type=int, default=50)
    pp.add_argument(
        "--custom", action="store_true",
        help="lab-subset builder: first --train_limit readable train images "
        "-> TRAIN, rest -> VAL (reference create_input_files_custom)",
    )
    pp.add_argument("--train_limit", type=int, default=500)

    tr = sub.add_parser("train")
    _add_common(tr)
    tr.add_argument("--epochs", type=int, default=20)
    tr.add_argument("--batch_size", type=int, default=64)
    tr.add_argument("--camera_train", type=lambda s: s.lower() in ("1", "true"), default=True)
    tr.add_argument("--warmup_ckpt", default=None, help="camera warm-start (Model.pth equivalent)")
    tr.add_argument(
        "--encoder_ckpt", default=None,
        help="torchvision resnet101 state_dict for the encoder warm start "
        "(reference train.py:94-109)",
    )
    tr.add_argument(
        "--resume", action="store_true",
        help="resume from the latest caption_state checkpoint in out_dir",
    )

    ev = sub.add_parser("eval")
    _add_common(ev)
    ev.add_argument("--split", default="TEST", choices=["VAL", "TEST"])
    ev.add_argument("--beam_size", type=int, default=5)
    ev.add_argument("--camera_mode", default="lens", choices=["lens", "none", "lowres"])
    ev.add_argument("--max_images", type=int, default=None)

    ht = sub.add_parser("heat")
    ht.add_argument("--steps", type=int, default=5000)
    ht.add_argument("--img_dir", required=True)
    ht.add_argument("--out", default="expr/camera_warmup")
    return p


def _setup(cfg, vocab_size):
    from ..optics.lens import LensSpec, init_lens_params, make_lens_constants
    from ..train.caption import init_caption

    spec = LensSpec()
    consts = make_lens_constants(spec)
    lens_params = init_lens_params(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, vocab_size, spec, lens_params, dtype=jnp.bfloat16
    )
    return spec, consts, encoder, decoder, state


def run_train(args):
    from ..config import CaptionConfig
    from ..data.caption import CaptionDataset, caption_batches
    from ..metrics.eval_caption import evaluate_captions
    from ..parallel.mesh import initialize_multihost
    from ..train.caption import make_caption_train_step
    from ..utils.checkpoint import StepCheckpoints
    from ..utils.logging import MetricWriter

    initialize_multihost()  # no-op single-process; must precede jax ops
    cfg = CaptionConfig(batch_size=args.batch_size, epochs=args.epochs)
    with open(os.path.join(args.data_folder, f"WORDMAP_{args.data_name}.json")) as f:
        word_map = json.load(f)
    train_ds = CaptionDataset(args.data_folder, args.data_name, "TRAIN")
    val_ds = CaptionDataset(args.data_folder, args.data_name, "VAL")
    spec, consts, encoder, decoder, state = _setup(cfg, len(word_map) + 1)
    if args.warmup_ckpt:
        from ..utils.torch_import import lens_params_from_torch, load_torch_state_dict

        state = state.replace(
            camera=lens_params_from_torch(load_torch_state_dict(args.warmup_ckpt))
        )
    if getattr(args, "encoder_ckpt", None):
        from ..utils.torch_import import (
            caption_encoder_variables_from_torch,
            load_torch_state_dict,
        )

        enc_vars = caption_encoder_variables_from_torch(
            load_torch_state_dict(args.encoder_ckpt)
        )
        state = state.replace(
            encoder=jax.tree_util.tree_map(jnp.asarray, enc_vars)
        )
    ckpts = StepCheckpoints(args.out_dir)
    start_epoch = 0
    if getattr(args, "resume", False):
        latest = ckpts.latest_step("caption_state")
        if latest is not None:
            state = ckpts.load(latest, "caption_state", state)
            start_epoch = latest
            print(f"Resumed captioning training from epoch {latest}")
        else:
            print(f"--resume: no caption_state checkpoint in {args.out_dir}")
    step_fn = make_caption_train_step(
        encoder, decoder, cfg, spec, consts, camera_train=args.camera_train
    )
    # Data parallelism: batch axis over the mesh, params/optimizer state
    # replicated — the same SPMD wiring as the GAN trainer
    # (cli/main.py run_train; SURVEY §7.4 "batch over ICI from day one").
    # The reference captioner was single-GPU (Image_Caption/train.py:37).
    # Multi-host: every process walks the same global batch order and
    # materializes only its block (data/caption.py caption_batches);
    # eval + checkpoint + logs are rank-0-only.
    from ..parallel.mesh import (
        is_primary,
        local_batch_size,
        make_mesh,
        replicate_pytree,
        shard_batch,
    )

    mesh = make_mesh(axis_names=("data",))
    state = replicate_pytree(mesh, state)
    primary = is_primary()
    writer = MetricWriter(args.out_dir, log_interval=50) if primary else None
    best_bleu4, step = 0.0, 0
    rng = jax.random.key(1)
    print(f"Start caption training on {len(mesh.devices.flat)} device(s)...")
    for epoch in range(start_epoch, cfg.epochs):
        for batch in caption_batches(
            train_ds, cfg.batch_size, shuffle=True, seed=epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        ):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(
                state,
                shard_batch(mesh, batch, local_batch=local_batch_size(cfg.batch_size)),
                sub,
            )
            step += 1
            if writer is not None:
                writer.write(step, metrics)
        if not primary:
            continue
        # Eval runs single-controller on the primary: pull host-local
        # copies of the (replicated) params so the eval jits are plain
        # local programs, not global-array computations.
        eval_state = (
            jax.device_get(state) if jax.process_count() > 1 else state
        )
        res = evaluate_captions(
            cfg, encoder, decoder, eval_state.encoder, eval_state.decoder,
            (eval_state.camera, consts, spec), val_ds, word_map, max_images=200,
        )
        writer.write(step, {f"val_{k}": v for k, v in res.items()}, force=True)
        # BLEU-4 save gate (reference train.py:230-238).
        if res["bleu4"] >= cfg.bleu4_gate and res["bleu4"] > best_bleu4:
            best_bleu4 = res["bleu4"]
            ckpts.save(epoch + 1, "caption_state", state)


def run_eval(args):
    from ..config import CaptionConfig
    from ..data.caption import CaptionDataset
    from ..metrics.eval_caption import evaluate_captions
    from ..utils.checkpoint import StepCheckpoints

    cfg = CaptionConfig(beam_size=args.beam_size)
    with open(os.path.join(args.data_folder, f"WORDMAP_{args.data_name}.json")) as f:
        word_map = json.load(f)
    ds = CaptionDataset(args.data_folder, args.data_name, args.split)
    spec, consts, encoder, decoder, state = _setup(cfg, len(word_map) + 1)
    ckpts = StepCheckpoints(args.out_dir)
    latest = ckpts.latest_step("caption_state")
    if latest is None:
        import sys

        print(
            f"WARNING: no caption_state checkpoint in {args.out_dir} — "
            "evaluating RANDOM-INIT models; scores are meaningless.",
            file=sys.stderr,
        )
    else:
        state = ckpts.load(latest, "caption_state", state)
    res = evaluate_captions(
        cfg, encoder, decoder, state.encoder, state.decoder,
        (state.camera, consts, spec), ds, word_map,
        beam_size=args.beam_size, camera_mode=args.camera_mode,
        max_images=args.max_images, out_dir=args.out_dir,
    )
    for k, v in res.items():
        print(f"{k}: {v:.4f}")


def run_heat(args):
    """Camera warm-up: train the defocus alone to MINIMIZE SSIM(orig,
    sensor) (reference Camera_heating.py:13-64)."""
    import optax

    from ..data.face import eval_batches
    from ..metrics.psnr_ssim import ssim
    from ..optics.lens import LensSpec, init_lens_params, lens_apply, make_lens_constants
    from ..utils.checkpoint import save_pytree

    spec = LensSpec()
    consts = make_lens_constants(spec)
    params = init_lens_params(spec)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs):
        def loss_fn(p):
            res = lens_apply(p, consts, spec, imgs, mask_mode="3")
            return ssim(imgs, res.sensor) + res.psf_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    it = 0
    while it < args.steps:
        for imgs in eval_batches(args.img_dir, spec.patch_size, 8):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(imgs))
            it += 1
            if it % 100 == 0:
                print(f"heat step {it}: ssim+psf {float(loss):.4f} defocus {float(params.defocus):.3f}")
            if it >= args.steps:
                break
    save_pytree(args.out, params)


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(0)
    if args.cmd == "preprocess":
        if args.custom:
            from ..data.caption import create_input_files_custom

            create_input_files_custom(
                args.dataset, args.karpathy_json, args.image_folder,
                args.captions_per_image, args.min_word_freq, args.output_folder,
                args.max_len, train_limit=args.train_limit,
            )
        else:
            from ..data.caption import create_input_files

            create_input_files(
                args.dataset, args.karpathy_json, args.image_folder,
                args.captions_per_image, args.min_word_freq, args.output_folder,
                args.max_len,
            )
    elif args.cmd == "train":
        run_train(args)
    elif args.cmd == "eval":
        run_eval(args)
    else:
        run_heat(args)


if __name__ == "__main__":
    main()
