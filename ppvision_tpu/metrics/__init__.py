"""Evaluation metrics: image (SSIM/PSNR, FID, LPIPS) and text (BLEU,
METEOR, ROUGE-L, CIDEr)."""

from .psnr_ssim import psnr, ssim  # noqa: F401
from .text import bleu_scores, cider_score, meteor_avg, rouge_lsum  # noqa: F401
