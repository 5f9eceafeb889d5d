"""Captioning model tests: encoder, masked-scan decoder, loss, beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.models.captioner import (
    AttentionLSTMDecoder,
    beam_search,
    caption_loss,
)
from ppvision_tpu.models.resnet import CaptionEncoder, adaptive_avg_pool

VOCAB = 50


def test_adaptive_avg_pool_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (36, 36)))
    want = (
        torch.nn.AdaptiveAvgPool2d((36, 36))(
            torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_encoder_shape_small():
    enc = CaptionEncoder(encoded_image_size=9, stage_sizes=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.key(0), x)
    y = enc.apply(variables, x)
    assert y.shape == (1, 9, 9, 2048)


@pytest.fixture(scope="module")
def decoder_setup():
    dec = AttentionLSTMDecoder(
        vocab_size=VOCAB, embed_dim=16, decoder_dim=24, attention_dim=20, encoder_dim=32
    )
    enc = jax.random.normal(jax.random.key(0), (3, 4, 4, 32))
    caps = jax.random.randint(jax.random.key(1), (3, 12), 0, VOCAB)
    lens = jnp.asarray([12, 7, 3])
    params = dec.init(jax.random.key(2), enc, caps, lens)["params"]
    return dec, params, enc, caps, lens


@pytest.mark.slow
def test_decoder_shapes_and_masking(decoder_setup):
    dec, params, enc, caps, lens = decoder_setup
    out = dec.apply({"params": params}, enc, caps, lens)
    assert out.predictions.shape == (3, 11, VOCAB)
    assert out.alphas.shape == (3, 11, 16)
    # Rows past each decode length are exactly zero (masked), and the
    # alphas of active steps sum to 1.
    np.testing.assert_array_equal(np.asarray(out.predictions[2, 3:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out.alphas[1, 7:]), 0.0)
    np.testing.assert_allclose(np.asarray(out.alphas[0].sum(-1)), 1.0, atol=1e-5)
    assert np.abs(np.asarray(out.predictions[0, :11])).max() > 0


@pytest.mark.slow
def test_masking_equals_truncated_batch(decoder_setup):
    """A short caption decoded in a batch must match decoding it alone."""
    dec, params, enc, caps, lens = decoder_setup
    out_full = dec.apply({"params": params}, enc, caps, lens)
    out_solo = dec.apply(
        {"params": params}, enc[2:3], caps[2:3, :3], jnp.asarray([3])
    )
    np.testing.assert_allclose(
        np.asarray(out_full.predictions[2, :2]),
        np.asarray(out_solo.predictions[0]),
        atol=1e-5,
    )


@pytest.mark.slow
def test_caption_loss_finite_and_grad(decoder_setup):
    dec, params, enc, caps, lens = decoder_setup

    def loss_fn(p):
        out = dec.apply({"params": p}, enc, caps, lens)
        ce, dsr, acc5 = caption_loss(out, caps)
        return ce + dsr

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads)
    )


@pytest.mark.slow
def test_beam_search_runs_and_prefers_end(decoder_setup):
    dec, params, enc, _, _ = decoder_setup
    tokens, score = beam_search(
        dec, params, enc[0:1], start_token=1, end_token=2, beam_size=4, max_steps=10
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (10,)
    assert np.isfinite(float(score))
    # After the first end token everything stays end.
    ends = np.where(tokens == 2)[0]
    if len(ends):
        assert (tokens[ends[0] :] == 2).all()
