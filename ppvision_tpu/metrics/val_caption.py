"""Teacher-forced captioning validation (reference ``validate`` /
``eval/val.py``): greedy-from-teacher-forcing hypotheses + corpus
BLEU-4 and loss/top-5 meters, batched over a VAL split.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CaptionConfig
from ..models.captioner import AttentionLSTMDecoder, caption_loss
from ..models.resnet import CaptionEncoder
from ..optics.lens import LensConstants, LensParams, LensSpec, lens_apply
from ..utils.logging import AverageMeter
from .text import bleu_scores

__all__ = ["validate_teacher_forced"]


def validate_teacher_forced(
    cfg: CaptionConfig,
    encoder: CaptionEncoder,
    decoder: AttentionLSTMDecoder,
    enc_vars: Any,
    dec_params: Any,
    camera: tuple[LensParams, LensConstants, LensSpec] | None,
    batches,
    word_map: dict[str, int],
    max_batches: int | None = None,
) -> dict[str, float]:
    start, end, pad = word_map["<start>"], word_map["<end>"], word_map["<pad>"]
    special = {start, end, pad}

    @jax.jit
    def forward(images, captions, caplens):
        x = images
        if camera is not None:
            lp, lc, ls = camera
            x = lens_apply(lp, lc, ls, x, mask_mode=cfg.mask_mode).sensor
        enc_out = encoder.apply(enc_vars, x, train=False)
        out = decoder.apply({"params": dec_params}, enc_out, captions, caplens)
        ce, dsr, acc5 = caption_loss(out, captions, cfg.alpha_c)
        preds = jnp.argmax(out.predictions, axis=-1)
        return ce + cfg.alpha_c * dsr, acc5, preds

    losses, top5 = AverageMeter(), AverageMeter()
    references, hypotheses = [], []
    for bi, batch in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        loss, acc5, preds = forward(
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["captions"]),
            jnp.asarray(batch["caption_lengths"]),
        )
        n = int(np.sum(batch["caption_lengths"] - 1))
        losses.update(float(loss), n)
        top5.update(float(acc5), n)
        preds = np.asarray(preds)
        for j in range(preds.shape[0]):
            ln = int(batch["caption_lengths"][j]) - 1
            hypotheses.append([int(t) for t in preds[j, :ln] if int(t) not in special])
            refs = batch.get("all_captions")
            if refs is not None:
                references.append(
                    [[int(t) for t in cap if int(t) not in special] for cap in refs[j]]
                )
            else:
                references.append(
                    [[int(t) for t in batch["captions"][j] if int(t) not in special]]
                )
    # Token-id BLEU, exactly as the reference's validate computes it
    # over encoded captions (train.py:428-447).
    str_refs = [[[str(t) for t in r] for r in rs] for rs in references]
    str_hyps = [[str(t) for t in h] for h in hypotheses]
    bleu4 = bleu_scores(str_refs, str_hyps)["bleu4"]
    return {"loss": losses.avg, "top5": top5.avg, "bleu4": float(bleu4)}
