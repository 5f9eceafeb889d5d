"""Teacher-forced validation + single-image attention captioning (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CaptionConfig
from ppvision_tpu.models.captioner import AttentionLSTMDecoder
from ppvision_tpu.models.resnet import CaptionEncoder

VOCAB = 24
WORD_MAP = {f"w{i}": i for i in range(1, VOCAB - 3)}
WORD_MAP.update({"<unk>": VOCAB - 3, "<start>": VOCAB - 2, "<end>": VOCAB - 1, "<pad>": 0})


@pytest.fixture(scope="module")
def small_stack():
    cfg = CaptionConfig(
        emb_dim=8, attention_dim=8, decoder_dim=8, encoded_image_size=3, beam_size=3,
        max_caption_len=6,
    )
    enc = CaptionEncoder(encoded_image_size=3, stage_sizes=(1, 1, 1, 1))
    dec = AttentionLSTMDecoder(
        vocab_size=VOCAB, embed_dim=8, decoder_dim=8, attention_dim=8
    )
    x = jnp.zeros((1, 32, 32, 3))
    enc_vars = enc.init(jax.random.key(0), x)
    dec_params = dec.init(
        jax.random.key(1), jnp.zeros((1, 3, 3, 2048)),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
    )["params"]
    return cfg, enc, dec, enc_vars, dec_params


@pytest.mark.slow
def test_validate_teacher_forced(small_stack):
    from ppvision_tpu.metrics.val_caption import validate_teacher_forced

    cfg, enc, dec, enc_vars, dec_params = small_stack
    rng = np.random.default_rng(0)
    batches = [
        dict(
            images=rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
            captions=rng.integers(1, VOCAB, (2, 6)).astype(np.int32),
            caption_lengths=np.asarray([6, 4], np.int32),
            all_captions=rng.integers(1, VOCAB, (2, 3, 6)).astype(np.int32),
        )
    ]
    res = validate_teacher_forced(
        cfg, enc, dec, enc_vars, dec_params, None, batches, WORD_MAP
    )
    assert set(res) == {"loss", "top5", "bleu4"}
    assert np.isfinite(res["loss"]) and 0 <= res["bleu4"] <= 1


@pytest.mark.slow
def test_caption_image_with_attention(small_stack, tmp_path):
    from ppvision_tpu.cli.caption_image import (
        caption_image_with_attention,
        render_attention_grid,
    )

    cfg, enc, dec, enc_vars, dec_params = small_stack
    image = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)
    words, alphas, shown = caption_image_with_attention(
        cfg, enc, dec, enc_vars, dec_params, None, image, WORD_MAP, beam_size=2
    )
    assert len(words) <= cfg.max_caption_len
    assert alphas.shape[1] == 9  # 3x3 encoded pixels
    out = tmp_path / "att.png"
    render_attention_grid(shown, words, alphas, str(out), enc_size=3)
    assert out.exists()
