"""Captioning trainer: one jitted step on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CaptionConfig
from ppvision_tpu.optics.lens import LensSpec, init_lens_params, make_lens_constants
from ppvision_tpu.train.caption import (
    _encoder_trainable_mask,
    init_caption,
    make_caption_train_step,
)

VOCAB = 30


@pytest.fixture(scope="module")
def setup():
    # camera_lr raised: the reference's 5e-7 is below float32 ulp at the
    # -22 defocus init, so a single step cannot move the parameter.
    cfg = CaptionConfig(
        emb_dim=16, attention_dim=16, decoder_dim=16, encoded_image_size=4,
        batch_size=2, camera_lr=1e-2,
    )
    spec = LensSpec(wave_res=64, patch_size=32, zernike_terms=16)
    consts = make_lens_constants(spec)
    lens_params = init_lens_params(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, VOCAB, spec, lens_params, encoder_stages=(1, 1, 1, 1)
    )
    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)
    batch = dict(
        images=jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)),
        captions=jax.random.randint(jax.random.key(2), (2, 10), 0, VOCAB),
        caption_lengths=jnp.asarray([10, 6]),
    )
    return cfg, state, step, batch


@pytest.mark.slow
def test_caption_train_step(setup):
    cfg, state, step, batch = setup
    new_state, metrics = step(state, batch, jax.random.key(3))

    assert int(new_state.step) == 1
    for k in ("loss", "ce", "dsr", "top5", "ssim", "psf_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert 0.0 <= float(metrics["ssim"]) <= 1.0

    # Camera defocus moved (trainable); frozen coeffs did not.
    assert float(new_state.camera.defocus) != float(state.camera.defocus)
    np.testing.assert_array_equal(
        np.asarray(new_state.camera.frozen_post), np.asarray(state.camera.frozen_post)
    )

    # Decoder moved; frozen encoder stem did not; fine-tuned stage did.
    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert delta(new_state.decoder, state.decoder) > 0
    bb_new = new_state.encoder["params"]["ResNetBackbone_0"]
    bb_old = state.encoder["params"]["ResNetBackbone_0"]
    assert delta(bb_new["Conv_0"], bb_old["Conv_0"]) == 0
    assert delta(bb_new["Bottleneck_0"], bb_old["Bottleneck_0"]) == 0
    assert delta(bb_new["Bottleneck_1"], bb_old["Bottleneck_1"]) > 0
    # BN statistics updated (train mode).
    assert delta(new_state.encoder["batch_stats"], state.encoder["batch_stats"]) > 0


@pytest.mark.slow
def test_encoder_mask_structure(setup):
    cfg, state, step, batch = setup
    mask = _encoder_trainable_mask(state.encoder["params"], 1)
    bb = mask["ResNetBackbone_0"]
    flat0 = jax.tree_util.tree_leaves(bb["Bottleneck_0"])
    flat1 = jax.tree_util.tree_leaves(bb["Bottleneck_1"])
    assert set(flat0) == {0.0}
    assert set(flat1) == {1.0}
    assert set(jax.tree_util.tree_leaves(bb["Conv_0"])) == {0.0}
