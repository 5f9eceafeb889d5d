"""N-step caption-training trajectory golden vs the LIVE torch reference.

Runs STEPS identical iterations of the reference Image_Caption training
recipe (train.py:243-352) in torch — camera -> ResNet encoder ->
attention-LSTM decoder, ``loss = 0.4*(CE + dsr) + 6*(1 - SSIM) +
30*psf_loss``, three Adams, value-clipped decoder/encoder grads,
camera stepped before the clip — and of
``train.caption.make_caption_train_step`` from the SAME weights on the
SAME fixed batches.

Like the GAN pair (see test_train_dynamics_golden), the comparison is
TEACHER-FORCED: although this objective is a smooth supervised soup
(no adversarial game), a free-running f32 trajectory still drifts —
measured ce rel-err reaches 1.5e-2 by step 8 and the discrete top-5
accuracy flips ranks, while final params drift to ~2lr mean — all
early-Adam sign noise on coordinates at the f32 gradient floor, not
semantics.  So the params are re-synced to the torch trajectory before
every iteration and the test checks, at each of the 10 steps, (1)
every loss metric at identical parameters and (2) the one-step
parameter update of camera/encoder/decoder against the reference's
post-step state-dict — the full dynamics operator (loss soup, three
Adams, clip-after-camera ordering) at the exact states the reference
visited, with only non-compounding single-step noise.

Fixture notes:
- ``torchvision.models.resnet101`` is substituted with a
  torchvision-layout mini ResNet (stages (1,1,1,1); the reference
  Encoder slices its ``children()`` — models.py:17-27 — so the mirror
  reproduces torchvision's exact child order).
- The reference's PSF masks are hardcoded 256px/radius-32 cv2 circles
  (Camera/Lens.py:111-126); at the 32px test patch both sides use OUR
  ``make_lens_constants`` masks (their parity at the shipped scale is
  proven by test_lens_golden).
- dropout=0 on both sides: framework RNGs cannot be matched.
- camera_lr is raised to 1e-3 (the shipped 5e-7 is below f32 ulp at
  the -22 defocus init, so the camera path would be untested).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from .golden_reference import import_caption_lens, import_caption_models
from .test_metric_net_parity import TBottleneck

VOCAB, EMB, DEC, ATT, ENC_IMG = 30, 32, 32, 32, 4
B, L, STEPS = 2, 10, 10
PATCH, WAVE, TERMS = 32, 64, 16
STAGES = (1, 1, 1, 1)
CAMERA_LR, ENCODER_LR, DECODER_LR = 1e-3, 1e-4, 5e-4

# Tolerances from a teacher-forced CPU probe run
# (PPVISION_CAPTION_PROBE=1 prints the measured distributions), with
# ~10x margin over the measured maxima across all 10 steps.  Metrics
# are computed BEFORE the update at re-synced params, so they carry
# only single-forward f32 noise.  top5 is a discrete rank count: at
# identical params it must match exactly, but one near-tie flip across
# the run is tolerated.
METRIC_TOL = {
    "loss": 1e-4, "ce": 1e-4, "dsr": 1e-3, "top5": 1e-6, "ssim": 1e-4,
    "psf_loss": 1e-5,
}
TOP5_FLIPS_ALLOWED = 1
# One-step parameter-update bounds, units of that group's lr (see the
# GAN test for why early-Adam noise is measured in lr units: at the
# f32 gradient floor an Adam step is a full +/-lr kick).
FORCED_BOUNDS = {
    "camera": dict(mean=0.05, flip=0.01, p50=0.05),
    "encoder": dict(mean=0.10, flip=0.03, p50=0.02),
    "decoder": dict(mean=0.10, flip=0.03, p50=0.02),
}


class TResNet101Like(tnn.Module):
    """Mirrors torchvision resnet101's state-dict keys AND child order
    (conv1, bn1, relu, maxpool, layer1-4, avgpool, fc) so the reference
    Encoder's ``children()[:-2]`` slice and ``[5:]`` fine-tune rule
    (models.py:19, 52) behave exactly as with the real torchvision net.
    """

    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        c_in, mid = 64, 64
        for stage, n in enumerate(stage_sizes):
            blocks = []
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TBottleneck(c_in, mid, stride=stride, project=(b == 0)))
                c_in = mid * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            mid *= 2
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(c_in, 10)


def _sd(module):
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


def _nchw(a):
    return torch.tensor(np.transpose(a, (0, 3, 1, 2)))


def _make_batches(n, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        caps = rng.integers(3, VOCAB, size=(B, L)).astype(np.int64)
        out.append(
            dict(
                images=rng.random((B, PATCH, PATCH, 3), np.float32),
                captions=caps,
                caption_lengths=np.asarray([L, L - 3], np.int64),
            )
        )
    return out


def _build_torch_lens(tmp_path):
    OpticsZernike = import_caption_lens()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    orig_device = torch.device

    def patched_device(*args, **kwargs):
        if args and isinstance(args[0], int):
            return orig_device("cpu")
        return orig_device(*args, **kwargs)

    torch.device = patched_device
    try:
        camera = OpticsZernike(
            input_shape=[None, PATCH, PATCH, 3],
            device=torch.device("cpu"),
            zernike_terms=TERMS,
            patch_size=PATCH,
            height_tolerance=0.0,
            sensor_distance=0.025,
            wave_resolution=[WAVE, WAVE],
            sample_interval=3e-6,
            upsample=False,
        )
    finally:
        torch.device = orig_device
        os.chdir(cwd)
    return camera


def _run_reference(batches, tmp_path, dbl=False, steps=STEPS):
    """``dbl=True`` runs the recipe in float64 (free-running f64
    golden): modules ``.double()``-converted, plus the OpticsZernike
    ``zernike_volume`` plain attribute (f32, not touched by
    ``Module.double()``) converted explicitly."""
    ref_models, ref_utils = import_caption_models(
        lambda *a, **k: TResNet101Like(STAGES)
    )
    import pytorch_ssim  # vendored in Image_Caption (on sys.path now)

    torch.manual_seed(0)
    trunk_holder = []
    ref_models.torchvision.models.resnet101 = lambda *a, **k: (
        trunk_holder.append(TResNet101Like(STAGES)) or trunk_holder[-1]
    )
    encoder = ref_models.Encoder(encoded_image_size=ENC_IMG)
    trunk = trunk_holder[-1]  # the Encoder wraps (not copies) its modules
    decoder = ref_models.DecoderWithAttention(
        attention_dim=ATT, embed_dim=EMB, decoder_dim=DEC,
        vocab_size=VOCAB, encoder_dim=trunk.fc.in_features,  # 2048
        dropout=0.0,
    )
    camera = _build_torch_lens(tmp_path)
    # 32px patch: install OUR constants' masks on the torch module (the
    # built-in ones are hardcoded 256px, Lens.py:111-126).
    from ppvision_tpu.optics.lens import LensSpec, make_lens_constants

    spec = LensSpec(
        wave_res=WAVE, patch_size=PATCH, zernike_terms=TERMS,
        height_tolerance=0.0,
    )
    # dbl: full-double folded constants on BOTH sides — ours via the
    # make_lens_constants dtype opt-in; torch via precision patches
    # below (its compl_exp_tf/psf2otf hardcode complex64 and its
    # zernike_volume is f32-generated even under Module.double()).
    if dbl:
        # x64 must be on while the f64 jnp constants are created (else
        # jnp.asarray silently truncates them to f32); the arrays keep
        # their dtype afterwards and are consumed under enable_x64().
        jax.config.update("jax_enable_x64", True)
    try:
        consts = make_lens_constants(
            spec, dtype=np.float64 if dbl else np.float32
        )
    finally:
        if dbl:
            jax.config.update("jax_enable_x64", False)
    keep = np.asarray(consts.mask_keep, np.float64)  # (P, P, 1)
    camera.mask_1 = torch.from_numpy(np.broadcast_to(1.0 - keep, (PATCH, PATCH, 3)).copy())
    camera.mask_2 = torch.from_numpy(np.broadcast_to(keep, (PATCH, PATCH, 3)).copy())

    if dbl:
        encoder.double(), decoder.double(), camera.double()
        # f64-precise Zernike volume, the same basis values our f64
        # constants fold (zernike_basis is shared through the poppy
        # shim, so f32 mode already matches bit-for-bit).
        from ppvision_tpu.optics.zernike import zernike_basis

        vol64 = zernike_basis(TERMS, WAVE) * 1e-6
        camera.zernike_volume = torch.from_numpy(vol64.copy())
        # Lift the reference's hardcoded complex64 casts to complex128
        # (Utils.py:80-85 compl_exp_tf, Utils.py:126-157 psf2otf) in
        # BOTH the Utils and Lens namespaces (Lens does import *).
        import importlib

        lens_mod = type(camera).__module__
        lens_ns = importlib.import_module(lens_mod)
        utils_ns = importlib.import_module(
            lens_mod.rsplit(".", 1)[0] + ".Utils"
        )
        orig_cexp = utils_ns.compl_exp_tf

        def cexp128(phase, dtype=torch.complex64):  # noqa: ARG001
            return orig_cexp(phase, dtype=torch.complex128)

        def psf2otf128(input_filter, output_size):
            # The reference's psf2otf verbatim (Utils.py:126-157) with
            # the hardcoded complex64 cast lifted to complex128.
            import torch.nn.functional as F  # noqa: PLC0415

            fh, fw, _, _ = list(input_filter.shape)
            if output_size[0] != fh:
                pad = (output_size[0] - fh) / 2
                if (output_size[0] - fh) % 2 != 0:
                    pt = pl_ = int(np.ceil(pad))
                    pb = pr = int(np.floor(pad))
                else:
                    pt = pl_ = int(pad) + 1
                    pb = pr = int(pad) - 1
                padded = F.pad(input_filter, [0, 0, 0, 0, pl_, pr, pt, pb])
            else:
                padded = input_filter
            padded = padded.permute(2, 0, 1, 3)
            padded = utils_ns.ifftshift2d(padded)
            padded = padded.permute(1, 2, 0, 3)
            tmp = padded.permute(2, 3, 0, 1)
            tmp = torch.fft.fftn(tmp.type(torch.complex128), dim=[-1, -2])
            return tmp.permute(2, 3, 0, 1)

        orig_area = utils_ns.area_downsampling_tf

        def area_downsample64(input_image, target_side_length):
            # Reference verbatim (Utils.py:216-248) minus the hardcoded
            # ``.type(torch.float32)`` PSF rounding; only the divisible
            # (plain AvgPool) branch is exercised at test scales.
            input_shape = list(input_image.shape)
            if not input_shape[1] % target_side_length:
                factor = int(input_shape[1] / target_side_length)
                x = input_image.permute(0, 3, 1, 2)
                x = torch.nn.AvgPool2d(factor, stride=factor)(x)
                return x.permute(0, 2, 3, 1)
            return orig_area(input_image, target_side_length)

        _patched = []
        for ns in (utils_ns, lens_ns):
            for name, fn in (
                ("compl_exp_tf", cexp128),
                ("psf2otf", psf2otf128),
                ("area_downsampling_tf", area_downsample64),
            ):
                if hasattr(ns, name):
                    _patched.append((ns, name, getattr(ns, name)))
                    setattr(ns, name, fn)
    else:
        _patched = []
    _cast = (lambda t: t.double()) if dbl else (lambda t: t)

    encoder.train(), decoder.train(), camera.train()
    criterion = tnn.CrossEntropyLoss()
    noise_loss = pytorch_ssim.SSIM()

    decoder_opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, decoder.parameters()), lr=DECODER_LR)
    encoder_opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, encoder.parameters()), lr=ENCODER_LR)
    camera_opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, camera.parameters()), lr=CAMERA_LR)

    sds_init = dict(trunk=_sd(trunk), decoder=_sd(decoder), camera=_sd(camera))

    from torch.nn.utils.rnn import pack_padded_sequence

    history = []
    sds_steps = []  # trunk/decoder/camera state-dicts after EVERY iteration
    for it in range(steps):
        bt = batches[it % len(batches)]
        imgs = _cast(_nchw(bt["images"]))
        caps = torch.tensor(bt["captions"])
        caplens = torch.tensor(bt["caption_lengths"]).unsqueeze(1)

        sensor, psf, zt, loss_psf = camera(imgs, None, "3")
        enc_out = encoder(sensor)
        scores, caps_sorted, decode_lengths, alphas, sort_ind = decoder(
            enc_out, caps, caplens)
        targets = caps_sorted[:, 1:]
        scores_p = pack_padded_sequence(scores, decode_lengths, batch_first=True)
        targets_p = pack_padded_sequence(targets, decode_lengths, batch_first=True)
        loss_ce = criterion(scores_p.data, targets_p.data)
        loss_dsr = ((1.0 - alphas.sum(dim=1)) ** 2).mean()
        ssim_val = noise_loss(imgs, sensor)
        loss = (
            0.4 * (loss_ce + loss_dsr) + 6.0 * (1.0 - ssim_val) + 30.0 * loss_psf
        )
        decoder_opt.zero_grad(), camera_opt.zero_grad(), encoder_opt.zero_grad()
        loss.backward()
        camera_opt.step()
        ref_utils.clip_gradient(decoder_opt, 5.0)
        ref_utils.clip_gradient(encoder_opt, 5.0)
        decoder_opt.step()
        encoder_opt.step()
        # clamp_zer (train.py:322-323) is a no-op: zernike_coeffs_train
        # is a single coefficient and the clamp indexes [1:].
        top5 = ref_utils.accuracy(scores_p.data, targets_p.data, 5)
        history.append(dict(
            loss=float(loss.detach()), ce=float(loss_ce.detach()),
            dsr=float(loss_dsr.detach()), top5=float(top5),
            ssim=float(ssim_val.detach()), psf_loss=float(loss_psf.detach()),
        ))
        sds_steps.append(
            dict(trunk=_sd(trunk), decoder=_sd(decoder), camera=_sd(camera)))

    for ns, name, orig in _patched:
        setattr(ns, name, orig)
    return history, sds_init, sds_steps, spec, consts


@pytest.mark.slow  # 10 torch camera+resnet+LSTM iters + one jit compile
def test_caption_training_trajectory_matches_reference(tmp_path):
    probe = bool(os.environ.get("PPVISION_CAPTION_PROBE"))
    batches = _make_batches(3)
    history, sds_init, sds_steps, spec, consts = _run_reference(batches, tmp_path)

    from ppvision_tpu.config import CaptionConfig
    from ppvision_tpu.train.caption import init_caption, make_caption_train_step
    from ppvision_tpu.utils import torch_import as ti

    cfg = CaptionConfig(
        emb_dim=EMB, attention_dim=ATT, decoder_dim=DEC,
        encoded_image_size=ENC_IMG, batch_size=B, dropout=0.0,
        camera_lr=CAMERA_LR, encoder_lr=ENCODER_LR, decoder_lr=DECODER_LR,
        camera_loss="SSIM",
    )
    asj = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    lens_params = jax.tree_util.tree_map(
        jnp.asarray, ti.lens_params_from_torch(sds_init["camera"]))
    encoder, decoder, state = init_caption(
        jax.random.key(0), cfg, VOCAB, spec, lens_params,
        encoder_stages=STAGES,
    )
    enc_vars = asj(ti.caption_encoder_variables_from_torch(
        sds_init["trunk"], STAGES))
    dec_params = asj(ti.decoder_params_from_torch(sds_init["decoder"]))
    state = state.replace(encoder=dict(enc_vars), decoder=dec_params)
    step = make_caption_train_step(encoder, decoder, cfg, spec, consts)

    jb = [
        dict(
            images=jnp.asarray(bt["images"]),
            captions=jnp.asarray(bt["captions"], jnp.int32),
            caption_lengths=jnp.asarray(bt["caption_lengths"], jnp.int32),
        )
        for bt in batches
    ]
    def flat_diff(ours_tree, ref_tree):
        a = jax.tree_util.tree_leaves(ours_tree)
        b = jax.tree_util.tree_leaves(asj(ref_tree))
        return np.concatenate(
            [np.abs(np.asarray(x) - np.asarray(y)).ravel() for x, y in zip(a, b)])

    lrs = dict(camera=CAMERA_LR, encoder=ENCODER_LR, decoder=DECODER_LR)
    top5_flips = 0
    for it in range(STEPS):
        state, metrics = step(state, jb[it % len(batches)], jax.random.key(it))
        # (1) every loss metric, computed at identical (forced) params.
        for k, want in history[it].items():
            got = float(metrics[k])
            err = abs(got - want) / max(abs(want), 1e-3)
            if probe:
                print(f"  step {it} {k:9s} ref {want:.6f} ours {got:.6f} rel {err:.3e}")
            elif k == "top5":
                top5_flips += err > METRIC_TOL[k]
            else:
                assert err < METRIC_TOL[k], (it, k, got, want, err)
        # (2) the one-step parameter update of every group.
        ref_sd = sds_steps[it]
        ref_groups = dict(
            decoder=ti.decoder_params_from_torch(ref_sd["decoder"]),
            encoder=ti.caption_encoder_variables_from_torch(
                ref_sd["trunk"], STAGES)["params"],
            camera=ti.lens_params_from_torch(ref_sd["camera"]),
        )
        ours_groups = dict(
            decoder=state.decoder, encoder=state.encoder["params"],
            camera=state.camera,
        )
        for name, bound in FORCED_BOUNDS.items():
            d = flat_diff(ours_groups[name], ref_groups[name])
            lr = lrs[name]
            flipped = float((d > lr).mean())
            p50 = float(np.quantile(d, 0.5))
            if probe:
                print(f"  step {it} {name:8s} mean {d.mean()/lr:.4f}lr "
                      f"p50 {p50/lr:.4f}lr max {d.max()/lr:.3f}lr "
                      f"frac>lr {flipped:.5f}")
            else:
                assert d.mean() < bound["mean"] * lr, (it, name, float(d.mean() / lr))
                assert flipped < bound["flip"], (it, name, flipped)
                assert p50 < bound["p50"] * lr, (it, name, p50 / lr)
        # Re-sync: next iteration starts exactly on the torch trajectory
        # (full encoder variables incl. BN running stats).
        state = state.replace(
            camera=asj(ref_groups["camera"]),
            encoder=dict(asj(ti.caption_encoder_variables_from_torch(
                ref_sd["trunk"], STAGES))),
            decoder=asj(ref_groups["decoder"]),
        )
    assert top5_flips <= TOP5_FLIPS_ALLOWED, top5_flips


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

    class _TmpPath(str):
        pass

    import tempfile

    test_caption_training_trajectory_matches_reference(tempfile.mkdtemp())
