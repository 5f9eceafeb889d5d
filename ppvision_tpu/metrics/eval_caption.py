"""Captioning evaluation: beam-search decode + text metrics + privacy metrics.

Equivalent of the reference's ``eval/eval_total.py``: per test image,
form the sensor image (camera), record PSNR/SSIM against the original
(privacy metrics, eval_total.py:78-85), encode, beam-search decode
(k=5, <=50 steps), then corpus BLEU-1..4, METEOR, ROUGE-Lsum, CIDEr,
and write Captions/Metrics reports (eval_total.py:204-296).

Baselines without the camera — the reference's ``eval_model_0`` (no
camera) and ``eval_no_camera`` (16x16 low-res) — are the
``camera_mode`` options.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CaptionConfig
from ..metrics.psnr_ssim import psnr, ssim
from ..models.captioner import AttentionLSTMDecoder, beam_search_batch
from ..models.resnet import CaptionEncoder
from ..optics.lens import LensConstants, LensParams, LensSpec, lens_apply
from ..ops.image import resize_bilinear
from .text import bleu_scores, cider_score, meteor_avg, rouge_lsum

__all__ = ["evaluate_captions"]


def _decode_tokens(ids, rev_word_map, stop_ids) -> list[str]:
    out = []
    for t in ids:
        t = int(t)
        if t in stop_ids:
            if t == stop_ids[-1]:  # <end>
                break
            continue
        out.append(rev_word_map.get(t, "<unk>"))
    return out


def evaluate_captions(
    cfg: CaptionConfig,
    encoder: CaptionEncoder,
    decoder: AttentionLSTMDecoder,
    enc_vars: Any,
    dec_params: Any,
    camera: tuple[LensParams, LensConstants, LensSpec] | None,
    dataset,  # data.caption.CaptionDataset (VAL/TEST)
    word_map: dict[str, int],
    beam_size: int | None = None,
    camera_mode: str = "lens",  # 'lens' | 'none' | 'lowres'
    max_images: int | None = None,
    out_dir: str | None = None,
    batch_size: int = 16,
) -> dict[str, float]:
    beam_size = beam_size or cfg.beam_size
    rev = {v: k for k, v in word_map.items()}
    start, end, pad = word_map["<start>"], word_map["<end>"], word_map["<pad>"]
    stop_ids = [pad, start, end]

    enc_fn = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))
    cam_fn = None
    if camera is not None and camera_mode == "lens":
        lp, lc, ls = camera
        cam_fn = jax.jit(
            lambda x: lens_apply(lp, lc, ls, x, mask_mode=cfg.mask_mode).sensor
        )

    # One device program per image BATCH: vmapped k-beam search decodes
    # batch_size*beam_size beams in lockstep (the reference host-loops
    # bs=1 over images, eval_total.py:96-175 — identical per-image
    # results, no host loop in the hot path).
    bs_fn = jax.jit(
        lambda enc_out: beam_search_batch(
            decoder, dec_params, enc_out, start, end, beam_size, cfg.max_caption_len
        )
    )
    # Per-image PSNR/SSIM within the batched call (reference computes
    # per image then averages, eval_total.py:78-85).
    psnr_b = jax.jit(jax.vmap(lambda a, b: psnr(a[None], b[None])))
    ssim_b = jax.jit(jax.vmap(lambda a, b: ssim(a[None], b[None])))

    references, hypotheses = [], []
    psnrs, ssims = [], []
    cpi = dataset.cpi
    n_images = len(dataset) // cpi
    if max_images is not None:
        n_images = min(n_images, max_images)

    for lo in range(0, n_images, batch_size):
        idx = range(lo, min(lo + batch_size, n_images))
        imgs, allcaps_b = [], []
        for i in idx:
            img, _, _, allcaps = dataset[i * cpi]
            imgs.append(img)
            allcaps_b.append(allcaps)
        x = jnp.asarray(np.stack(imgs))
        if camera_mode == "lens" and cam_fn is not None:
            sensor = cam_fn(x)
            psnrs.extend(np.asarray(psnr_b(x, sensor)).tolist())
            ssims.extend(np.asarray(ssim_b(x, sensor)).tolist())
        elif camera_mode == "lowres":
            # 16x16 -> full-res baseline (reference eval_no_camera.py:29).
            h = x.shape[1]
            sensor = resize_bilinear(resize_bilinear(x, (16, 16)), (h, h))
        else:
            sensor = x
        tokens_b, _ = bs_fn(enc_fn(sensor))
        for tokens, allcaps in zip(np.asarray(tokens_b), allcaps_b):
            hypotheses.append(_decode_tokens(tokens, rev, stop_ids))
            references.append(
                [_decode_tokens(np.asarray(c), rev, stop_ids) for c in allcaps]
            )

    results = bleu_scores(references, hypotheses)
    results["meteor"] = meteor_avg(references, hypotheses)
    results["rouge_lsum"] = rouge_lsum(references, hypotheses)
    results["cider"], _ = cider_score(references, hypotheses)
    if psnrs:
        results["psnr"] = float(np.mean(psnrs))
        results["ssim"] = float(np.mean(ssims))

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "Captions.txt"), "w") as f:
            for hyp in hypotheses:
                f.write(" ".join(hyp) + "\n")
        with open(os.path.join(out_dir, "Metrics.txt"), "w") as f:
            f.write("-" * 72 + "\n")
            for k, v in results.items():
                f.write(f"{k} @ beam size {beam_size}: {v:.4f}\n")
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results
