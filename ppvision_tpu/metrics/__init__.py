"""Evaluation metrics: image (SSIM/PSNR, FID, LPIPS) and text (BLEU,
METEOR, ROUGE-L, CIDEr)."""

from .face_id import IResNet, face_id_cosine, make_embed_fn  # noqa: F401
from .psnr_ssim import psnr, ssim  # noqa: F401
from .temporal import flow_consistency  # noqa: F401
from .text import bleu_scores, cider_score, meteor_avg, rouge_lsum  # noqa: F401
