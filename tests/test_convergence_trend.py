"""Few-hundred-step convergence TREND tests (beyond the 30/150-step
smoke tier in test_convergence_smoke.py).

What the reference promises and these emulate:

* GAN (Face-DeId/core/solver.py:107-248): long adversarial training
  stays bounded — D and G losses oscillate without blow-up, the
  generator does not mode-collapse (distinct latents keep producing
  distinct images), and the EMA keeps tracking the raw parameters.
* caption (Image_Caption/train.py:230-238): the reference GATES
  checkpoints on BLEU-4 >= 0.20 from beam-search decoding — so the
  trainer must drive BLEU-4 on a memorizable synthetic set past that
  gate, with cross-entropy trending strictly down across the run.

Real datasets/pretrained weights do not exist in this environment, so
both runs are tiny-shape synthetic — the assertions are about the
TRENDS the training dynamics must show, not end-task quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig

IMG = 32
GAN_STEPS = 200
CAP_STEPS = 400


@pytest.mark.slow  # ~200 tiny GAN iters on CPU
def test_gan_trend_bounded_no_collapse():
    from ppvision_tpu.optics.camera import (
        CameraSpec, init_camera_params, make_camera_constants,
    )
    from ppvision_tpu.train.gan import FrozenNets, init_gan, make_train_step

    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=16,
                          style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
        loss=LossConfig(lambda_heatmap=0.0, ds_iter=GAN_STEPS // 2),
    )
    models, fan, state = init_gan(jax.random.key(0), cfg)
    spec = CameraSpec(n=IMG, zernike_terms=cfg.camera.zernike_terms)
    fan_params = fan.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
    frozen = FrozenNets(
        camera_params=init_camera_params(jax.random.key(2), spec),
        camera_consts=make_camera_constants(spec),
        fan_params=fan_params,
        fan_priv_params=fan_params,
    )
    b, n_batches = 2, 8
    ks = jax.random.split(jax.random.key(3), 6 * n_batches)
    batches = [
        dict(
            x_src=jax.random.uniform(ks[6 * i + 0], (b, IMG, IMG, 3)),
            y_src=jnp.zeros((b,), dtype=jnp.int32),
            x_ref=jax.random.uniform(ks[6 * i + 1], (b, IMG, IMG, 3)),
            x_ref2=jax.random.uniform(ks[6 * i + 2], (b, IMG, IMG, 3)),
            y_ref=jnp.ones((b,), dtype=jnp.int32),
            z_trg=jax.random.normal(ks[6 * i + 3], (b, cfg.model.latent_dim)),
            z_trg2=jax.random.normal(ks[6 * i + 4], (b, cfg.model.latent_dim)),
        )
        for i in range(n_batches)
    ]
    step = make_train_step(models, fan, cfg)

    hist = []
    for it in range(GAN_STEPS):
        state, metrics = step(state, frozen, batches[it % n_batches])
        if it % 10 == 0 or it == GAN_STEPS - 1:
            m = {k: float(v) for k, v in metrics.items()}
            for k, v in m.items():
                assert np.isfinite(v), (it, k, v)
            hist.append((it, m))

    # Bounded adversarial game: neither side's loss blows up late in the
    # run (blow-up = losses growing without bound as D or G wins).
    late = [m for it, m in hist if it >= GAN_STEPS // 2]
    for key in ("D/latent_real", "D/latent_fake", "G/latent_adv",
                "D/ref_real", "D/ref_fake", "G/ref_adv"):
        peak = max(m[key] for m in late)
        assert peak < 25.0, (key, peak)
    # Cycle term holds its improvement (supervised-ish anchor).
    cyc_first = np.mean([m["G/latent_cyc"] for _, m in hist[:3]])
    cyc_late = np.mean([m["G/latent_cyc"] for _, m in hist[-3:]])
    assert cyc_late < cyc_first, (cyc_first, cyc_late)

    # No mode collapse: distinct latents must still produce distinct
    # images through the EMA generator (the collapse failure mode is
    # style-independent output).  Variance ACROSS STYLES per pixel,
    # averaged, must clear a floor well above numerical noise.
    gen, mapper = models["generator"], models["mapping_network"]
    x = batches[0]["x_src"]
    z = jax.random.normal(jax.random.key(9), (8, cfg.model.latent_dim))
    y = jnp.zeros((8,), jnp.int32)
    styles = mapper.apply(
        {"params": state.ema_params["mapping_network"]}, z, y
    )
    fakes = jnp.stack([
        gen.apply(
            {"params": state.ema_params["generator"]},
            x, jnp.broadcast_to(s[None], (x.shape[0], s.shape[-1])),
        )
        for s in styles
    ])  # (8, B, H, W, 3)
    across_style_std = float(jnp.std(fakes, axis=0).mean())
    assert across_style_std > 1e-3, across_style_std

    # EMA tracking: moved off init, still within the raw trajectory's
    # travel distance (convex combination of visited params).
    p = np.asarray(jax.tree_util.tree_leaves(state.params["generator"])[0])
    e = np.asarray(jax.tree_util.tree_leaves(state.ema_params["generator"])[0])
    assert np.abs(e - p).max() > 0.0
    assert np.abs(e - p).mean() < GAN_STEPS * 1e-4


@pytest.mark.slow  # ~400 tiny caption iters + beam decode on CPU
def test_caption_ce_down_bleu4_past_gate():
    from ppvision_tpu.config import CaptionConfig
    from ppvision_tpu.metrics.text import bleu_scores
    from ppvision_tpu.models.captioner import beam_search_batch
    from ppvision_tpu.optics.lens import (
        LensSpec, init_lens_params, make_lens_constants,
    )
    from ppvision_tpu.train.caption import init_caption, make_caption_train_step

    vocab = 30
    start_tok, end_tok, pad_tok = 1, 2, 0
    cfg = CaptionConfig(
        emb_dim=32, attention_dim=32, decoder_dim=32, encoded_image_size=4,
        batch_size=2, dropout=0.0, camera_lr=0.0, w_ssim=0.0, w_psf=0.0,
    )
    spec = LensSpec(wave_res=64, patch_size=32, zernike_terms=16)
    consts = make_lens_constants(spec)
    lens_params = init_lens_params(spec)
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, vocab, spec, lens_params,
        encoder_stages=(1, 1, 1, 1),
    )
    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)

    # Memorizable synthetic set: <start> w1..w8 <end> per image.
    caps = np.array(
        jax.random.randint(jax.random.key(2), (2, 10), 4, vocab))
    caps[:, 0] = start_tok
    caps[:, -1] = end_tok
    batch = dict(
        images=jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)),
        captions=jnp.asarray(caps),
        caption_lengths=jnp.asarray([10, 10]),
    )
    refs = [[caps[i, 1:-1].tolist()] for i in range(2)]

    def bleu4_now(state):
        from ppvision_tpu.optics.lens import lens_apply

        res = lens_apply(state.camera, consts, spec, batch["images"],
                         mask_mode=cfg.mask_mode)
        enc_out = encoder.apply(
            dict(state.encoder), res.sensor, train=False
        )
        toks, _ = beam_search_batch(
            decoder, state.decoder, enc_out, start_tok, end_tok,
            beam_size=3, max_steps=12,
        )
        hyps = []
        for row in np.asarray(toks):
            out = []
            for t in row.tolist():
                if t == end_tok:
                    break
                if t not in (start_tok, pad_tok):
                    out.append(int(t))
            hyps.append(out)
        return bleu_scores(refs, hyps)["bleu4"]

    b4_initial = bleu4_now(state)

    ce = []
    for it in range(CAP_STEPS):
        state, metrics = step(state, batch, jax.random.key(10 + it))
        ce.append(float(metrics["ce"]))
        assert np.isfinite(ce[-1]), it

    # CE trends down across the run (window means, since the per-step
    # series has Adam jitter; late windows may plateau within 2%).
    w = 25
    means = [float(np.mean(ce[i : i + w])) for i in range(0, CAP_STEPS, w)]
    assert all(b < a * 1.02 for a, b in zip(means, means[1:])), means
    assert means[-1] < 0.5 * means[0], means
    # Measured: 3.42 -> 1.17 by step 250 at the reference decoder_lr.
    assert ce[-1] < 0.35 * ce[0], (ce[0], ce[-1])

    # BLEU-4 rises past the reference's 0.20 checkpoint gate
    # (Image_Caption/train.py:230-238) from its near-zero start.
    b4_final = bleu4_now(state)
    assert b4_final > max(0.20, b4_initial), (b4_initial, b4_final)
