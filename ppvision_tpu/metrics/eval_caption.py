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
from ..models.captioner import AttentionLSTMDecoder, beam_search
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

    bs_fn = jax.jit(
        lambda enc_out: beam_search(
            decoder, dec_params, enc_out, start, end, beam_size, cfg.max_caption_len
        )
    )

    references, hypotheses = [], []
    psnrs, ssims = [], []
    cpi = dataset.cpi
    n_images = len(dataset) // cpi
    if max_images is not None:
        n_images = min(n_images, max_images)

    for i in range(n_images):
        img, _, _, allcaps = dataset[i * cpi]
        x = jnp.asarray(img)[None]
        if camera_mode == "lens" and cam_fn is not None:
            sensor = cam_fn(x)
            psnrs.append(float(psnr(x, sensor)))
            ssims.append(float(ssim(x, sensor)))
        elif camera_mode == "lowres":
            # 16x16 -> full-res baseline (reference eval_no_camera.py:29).
            h = x.shape[1]
            sensor = resize_bilinear(resize_bilinear(x, (16, 16)), (h, h))
        else:
            sensor = x
        enc_out = enc_fn(sensor)
        tokens, _ = bs_fn(enc_out)
        hypotheses.append(_decode_tokens(np.asarray(tokens), rev, stop_ids))
        refs = [
            _decode_tokens(np.asarray(c), rev, stop_ids) for c in allcaps
        ]
        references.append(refs)

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
