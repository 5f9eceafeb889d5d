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
    return cfg, state, step, batch, (encoder, decoder, spec, consts)


@pytest.mark.slow
def test_caption_train_step(setup):
    cfg, state, step, batch, _ = setup
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
def test_sharded_caption_step_matches_single_device(setup):
    """8-way data-parallel caption step == single device (SURVEY §7.4).

    The risk spots this pins: the lens' batch-global ``jnp.max``
    normalize (optics/lens.py:315-321), the encoder's batch-stat
    BatchNorm (global-batch mean/var under GSPMD), and the dropout /
    noise RNG streams, which must be sharding-invariant."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, state, step, _, _ = setup
    b = 8
    big = dict(
        images=jax.random.uniform(jax.random.key(11), (b, 32, 32, 3)),
        captions=jax.random.randint(jax.random.key(12), (b, 10), 0, VOCAB),
        caption_lengths=jnp.asarray([10, 6, 8, 10, 4, 7, 9, 10]),
    )
    rng = jax.random.key(13)
    ref_state, ref_metrics = step(state, big, rng)

    assert len(jax.devices()) >= 8
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    big_sharded = {k: jax.device_put(v, shard) for k, v in big.items()}
    new_state, metrics = step(jax.device_put(state, rep), big_sharded, rng)

    for k in ref_metrics:
        assert float(metrics[k]) == pytest.approx(
            float(ref_metrics[k]), rel=1e-4, abs=1e-6
        ), k

    # Adam's first-step update is ~sign(g)*lr; on near-zero-gradient
    # elements, f32 reduction-order noise (8-way tree reduce vs one
    # reduce) flips the sign, so individual elements may differ by
    # O(lr).  Bound max at 10*lr and MEAN at lr/10 — a systematic
    # per-shard bug (e.g. per-shard BN stats or per-shard max
    # normalize) shifts every element and fails both, plus the exact
    # metrics check above.
    def bound(ref, new, lr):
        diff = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b_)).ravel()
            for a, b_ in zip(
                jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(new)
            )
        ])
        assert diff.max() < 10 * lr, diff.max()
        assert diff.mean() < lr / 10, diff.mean()

    bound(ref_state.decoder, new_state.decoder, cfg.decoder_lr)
    bound(ref_state.encoder["params"], new_state.encoder["params"], cfg.encoder_lr)
    # Batch statistics come from the forward pass alone (no optimizer):
    # global-batch mean/var under GSPMD must match tightly.
    for a, b_ in zip(
        jax.tree_util.tree_leaves(ref_state.encoder["batch_stats"]),
        jax.tree_util.tree_leaves(new_state.encoder["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
    assert float(new_state.camera.defocus) == pytest.approx(
        float(ref_state.camera.defocus), rel=1e-4, abs=1e-4
    )


@pytest.mark.slow
def test_remat_caption_step_runs_and_metrics_match(setup):
    """cfg.remat checkpoints the encoder: identical forward values
    (metrics computed pre-optimizer are deterministic given the same
    rng), finite step end to end."""
    import dataclasses

    cfg, state, step, batch, (encoder, decoder, spec, consts) = setup
    rng = jax.random.key(3)
    _, ref_metrics = step(state, batch, rng)
    step_r = make_caption_train_step(
        encoder, decoder, dataclasses.replace(cfg, remat=True), spec, consts
    )
    new_state, metrics = step_r(state, batch, rng)
    assert int(new_state.step) == 1
    for k, v in ref_metrics.items():
        assert float(metrics[k]) == pytest.approx(
            float(v), rel=1e-5, abs=1e-7
        ), k


@pytest.mark.slow
def test_encoder_mask_structure(setup):
    cfg, state, step, batch, _ = setup
    mask = _encoder_trainable_mask(state.encoder["params"], 1)
    bb = mask["ResNetBackbone_0"]
    flat0 = jax.tree_util.tree_leaves(bb["Bottleneck_0"])
    flat1 = jax.tree_util.tree_leaves(bb["Bottleneck_1"])
    assert set(flat0) == {0.0}
    assert set(flat1) == {1.0}
    assert set(jax.tree_util.tree_leaves(bb["Conv_0"])) == {0.0}
