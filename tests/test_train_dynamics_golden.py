"""N-step GAN training-trajectory golden vs the LIVE torch reference.

Every component is parity-tested at matched weights elsewhere; this
test proves the training DYNAMICS match (SURVEY §7 "GAN training
dynamics parity — easy to get silently wrong"): Adam epsilon/bias
correction, torch-style pre-moment weight decay, the loss soup and its
quirks (R1 on x_ref, value-only heatmap L1, gradient-bearing LPIPS),
sub-step ordering (D/D/G+M+E/G), EMA timing, and the lambda_ds decay —
by running 20 identical iterations of the reference Solver recipe
(Face-DeId/core/solver.py:136-193) in torch and of
``train.gan.make_train_step`` in JAX from the SAME weights on the SAME
fixed batches.

Comparison design.  An f32 free-running trajectory of this system is
CHAOTIC, not merely noisy: at Adam step t=1, v_hat == g^2, so the
update is exactly sign(g)*lr per coordinate; any coordinate whose true
gradient sits at the f32 cross-framework noise floor (~1e-6 rel,
different reduction orders) gets a 2*lr kick of arbitrary sign, and
the adversarial D/G game amplifies those kicks — measured free-running
divergence on the loss curves is 5% at step 0, 78% at step 1, 720% at
step 2, regardless of implementation correctness.  So the test is
TEACHER-FORCED: it re-syncs the params to the torch trajectory before
every iteration and checks, at each of the 20 steps, (1) every loss
metric at identical parameters and (2) the one-step parameter update
of every net against the reference's post-step state-dict — i.e. the
full dynamics operator at the exact states the reference visited, with
only non-compounding single-step noise.  The final EMA params are
compared after the 20 forced steps.

Tolerances were set from a CPU probe run (PPVISION_DYNAMICS_PROBE=1
prints the measured error distributions) with 3-10x margin; see the
comments at the constants.

Scope notes:
- The RAFT flow term is omitted on BOTH sides (solver.py:163/178): it
  is gradient-bearing but a 20-iteration torch RAFT backward per
  sub-step makes the test hour-scale on CPU; its parity is covered by
  the RAFT importer goldens + the single-step sharded-equivalence test.
- The reference initializes nets_ema from the PRE-he_init deepcopy
  (solver.py:81-85 skips '*ema*'); both sides here start EMA == params
  (the EMA trajectory is a pure function of the params trajectory, so
  this normalization removes an init quirk, not dynamics).
- The torch driver uses the reference's own ``compute_d_loss`` /
  ``compute_g_loss`` / ``moving_average`` functions imported from
  /root/reference — not re-typed copies.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from .golden_reference import (
    import_face_deid_camera,
    import_face_deid_models,
    import_face_deid_solver,
)

IMG, STYLE, LAT, MC, B, STEPS = 32, 8, 16, 32, 2, 20
TERMS = 16

# Tolerances from a CPU probe run (PPVISION_DYNAMICS_PROBE=1), with
# 3-10x margin over the measured maxima across all 20 steps.  Metric
# error grows with SUB-STEP depth inside one iteration (later sub-steps
# run on params already updated this iteration, which carry the Adam
# sign-flip noise of the earlier sub-steps): measured maxima were
# D/latent 1.7e-4, D/ref 1.4e-3, G/latent 2.1e-3, G/ref 5.0e-2.
FORCED_METRIC_TOL = {
    "D/latent": 1e-3, "D/ref": 1e-2, "G/latent": 2e-2, "G/ref": 0.15,
}
# Param-update bounds, units of that net's lr.  The generator is
# looser: it is updated twice per iteration, its second update flows
# through the within-iteration divergence, and in this toy fixture a
# sizable fraction of its coordinates sit at the f32 gradient noise
# floor where early-Adam updates are pure sign(g)*lr kicks (measured
# worst over 20 steps: mean 0.48lr and 17.5% of coords > lr at step 0,
# p50 0.21lr at step 1, settling to p50 ~0.05-0.09lr by step 10).
FORCED_BOUNDS = {
    "mapping_network": dict(mean=0.05, flip=0.02, p50=0.02),
    "style_encoder": dict(mean=0.05, flip=0.02, p50=0.02),
    "discriminator": dict(mean=0.05, flip=0.02, p50=0.03),
    "generator": dict(mean=1.0, flip=0.35, p50=0.5),
}
EMA_MAX_TOL = 3e-5  # measured max 3.0e-6


def _he_init(module):
    """Reference core/utils.py:37-45 (he_init), re-typed: kaiming-normal
    fan-in for Conv2d/Linear kernels, zero bias."""
    if isinstance(module, (tnn.Conv2d, tnn.Linear)):
        tnn.init.kaiming_normal_(module.weight, mode="fan_in", nonlinearity="relu")
        if module.bias is not None:
            tnn.init.zeros_(module.bias)


def _torch_alexnet_features():
    # torchvision alexnet.features WITHOUT its trailing MaxPool: LPIPS
    # only taps the five ReLU outputs, and at 32x32 input the final
    # pool's input is already 1x1 (kernel 3 cannot run).  No params are
    # dropped, so state-dict key indices are unchanged.
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
    )


def _torch_lpips(feats, lin_w, x, y):
    """Reference LPIPS.forward (Face-DeId/metrics/lpips.py:61-72)."""
    # dtype follows the input: double in the f64 free-running golden
    # (where the JAX side's constants are double too), f32 otherwise.
    mu = torch.tensor([-0.03, -0.088, -0.188], dtype=x.dtype).view(1, 3, 1, 1)
    sigma = torch.tensor([0.458, 0.448, 0.450], dtype=x.dtype).view(1, 3, 1, 1)
    x = (x - mu) / sigma
    y = (y - mu) / sigma

    def fmaps(z):
        out = []
        for layer in feats:
            z = layer(z)
            if isinstance(layer, tnn.ReLU):
                out.append(z)
        return out

    def normalize(f):
        return f * torch.rsqrt(torch.sum(f**2, dim=1, keepdim=True) + 1e-10)

    total = 0.0
    for fx, fy, w in zip(fmaps(x), fmaps(y), lin_w):
        d = (normalize(fx) - normalize(fy)) ** 2
        total = total + torch.mean(F.conv2d(d, w))
    return total


def _nchw(a):
    return torch.tensor(np.transpose(a, (0, 3, 1, 2)))


def _sd(module):
    # .copy() is load-bearing: .numpy() aliases the tensor storage, and
    # the in-place optimizer updates would silently mutate any
    # "initial" snapshot taken before training.
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


def _make_batches(n, b, latent_dim, seed=5):
    rng = np.random.default_rng(seed)
    return [
        dict(
            x_src=rng.random((b, IMG, IMG, 3), np.float32),
            y_src=np.zeros((b,), np.int32),
            x_ref=rng.random((b, IMG, IMG, 3), np.float32),
            x_ref2=rng.random((b, IMG, IMG, 3), np.float32),
            y_ref=np.ones((b,), np.int32),
            z_trg=rng.standard_normal((b, latent_dim)).astype(np.float32),
            z_trg2=rng.standard_normal((b, latent_dim)).astype(np.float32),
        )
        for _ in range(n)
    ]


class _Munch(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _run_reference(batches, dbl=False, steps=STEPS):
    """solver.py:136-193, minus the RAFT flow lines (see module doc).

    ``dbl=True`` runs the whole recipe in float64 (nets, FAN, LPIPS,
    optimizer moments, batch tensors) for the free-running f64 golden —
    the AddCoordsTh coord tensors are plain attributes that
    ``Module.double()`` does not convert, so they are converted
    explicitly (their VALUES stay the reference's f32 arithmetic,
    promoted — exactly what ppvision_tpu's f32-computed coord constants
    promote to)."""
    ref_model, ref_wing = import_face_deid_models()
    TorchCamera = import_face_deid_camera()
    ref_solver = import_face_deid_solver()
    compute_d_loss = ref_solver.compute_d_loss
    compute_g_loss = ref_solver.compute_g_loss
    moving_average = ref_solver.moving_average

    def _r1_reg(d_out, x_in):
        # solver.py:379-388 verbatim except .view -> .reshape: torch CPU
        # conv backward returns channels-last (non-contiguous) input
        # grads here, which .view rejects; identical numerics.
        grad_dout = torch.autograd.grad(
            outputs=d_out.sum(), inputs=x_in, create_graph=True,
            retain_graph=True, only_inputs=True, allow_unused=True,
        )[0]
        grad_dout2 = grad_dout.pow(2)
        assert grad_dout2.size() == x_in.size()
        return 0.5 * grad_dout2.reshape(x_in.size(0), -1).sum(1).mean(0)

    ref_solver.r1_reg = _r1_reg  # compute_d_loss reads the module global

    torch.manual_seed(0)
    nets = _Munch(
        generator=ref_model.Generator(IMG, STYLE, max_conv_dim=MC, w_hpf=1),
        mapping_network=ref_model.MappingNetwork(LAT, STYLE, 2),
        style_encoder=ref_model.StyleEncoder(IMG, STYLE, 2, max_conv_dim=MC),
        discriminator=ref_model.Discriminator(IMG, 2, max_conv_dim=MC),
    )
    for net in nets.values():
        net.apply(_he_init)
    fan = ref_wing.FAN().eval()
    fan_priv = ref_wing.FAN().eval()
    # compute_g_loss reads nets.fan for its (discarded) cycle-branch
    # heatmap call (solver.py:355-357); never he_init'd (solver.py:82).
    nets["fan"] = fan
    camera = TorchCamera(device="cpu", N=IMG, zernike_terms=TERMS).eval()
    feats = _torch_alexnet_features().eval()
    g = torch.Generator().manual_seed(12)
    lin_w = [
        torch.rand((1, c, 1, 1), generator=g) for c in (64, 192, 384, 256, 256)
    ]
    nets_ema = _Munch(
        {k: copy.deepcopy(v) for k, v in nets.items()
         if k not in ("discriminator", "fan")}
    )

    if dbl:
        for mod in (*nets.values(), *nets_ema.values(), fan, fan_priv, feats):
            mod.double()
        lin_w = [w.double() for w in lin_w]
        for mod in (fan, fan_priv):
            for m in mod.modules():
                if type(m).__name__ == "AddCoordsTh":
                    m.coords = m.coords.double()
                    m.x_coords = m.x_coords.double()
                    m.y_coords = m.y_coords.double()
    _cast = (lambda t: t.double()) if dbl else (lambda t: t)

    # ds_iter=8: the decrement 1/8 is exact in binary, so the reference's
    # use-then-decrement loop (solver.py:192-193) reaches exactly 0.0 and
    # its `if lambda_ds > 0` gate stops.  At ds_iter=10 the float residual
    # after 10 decrements is +1.4e-16, one MORE decrement fires, and the
    # torch side trains with lambda_ds = -0.1 forever after — an
    # accumulation artifact of the toy scale, not reference semantics
    # (at the real ds_iter=100000 the overshoot is a negligible ~-1e-5).
    args = _Munch(
        lambda_reg=1.0, lambda_sty=1.0, lambda_ds=1.0, lambda_cyc=7.0,
        ds_iter=8, w_hpf=1.0, lpips=2000.0,
    )
    optims = {
        name: torch.optim.Adam(
            net.parameters(),
            lr=1e-6 if name == "mapping_network" else 1e-4,
            betas=(0.0, 0.99), weight_decay=1e-4,
        )
        for name, net in nets.items()
        if name != "fan"  # solver.py:61-63 skips fan/fan_priv
    }

    def reset_grad():
        for o in optims.values():
            o.zero_grad()

    sds_init = dict(
        nets={k: _sd(v) for k, v in nets.items()},
        fan=_sd(fan), fan_priv=_sd(fan_priv), camera=_sd(camera),
        alexnet=_sd(feats),
        lpips_lin={f"lpips_weights.{i}.main.1.weight": w.detach().numpy()
                   for i, w in enumerate(lin_w)},
    )

    initial_lambda_ds = args.lambda_ds
    # Precompute the private images ONCE per batch with the torch
    # camera and hand the SAME arrays to the JAX side as batch["x_priv"]
    # (the reference's paired Org/Priv dataset path,
    # data_loader.py:23-49): the camera is frozen and separately
    # golden-tested; its f32-chirp rounding (~1e-2, see
    # test_camera_golden's tolerance budget) would otherwise swamp the
    # DYNAMICS comparison this test is for.
    x_privs = []
    with torch.no_grad():
        for bt in batches:
            # The camera itself stays f32 even in dbl mode (it is frozen
            # and BYPASSED on the JAX side — both frameworks receive the
            # identical precomputed array, so its precision cancels).
            x_privs.append(_cast(camera(_nchw(bt["x_src"])).detach()))
    history = []
    sds_steps = []  # all 4 nets' state-dicts after EVERY iteration
    for it in range(steps):
        bt = batches[it % len(batches)]
        x_real_org = _cast(_nchw(bt["x_src"]))
        y_org = torch.tensor(bt["y_src"], dtype=torch.long)
        x_ref = _cast(_nchw(bt["x_ref"]))
        x_ref2 = _cast(_nchw(bt["x_ref2"]))
        y_trg = torch.tensor(bt["y_ref"], dtype=torch.long)
        z_trg = _cast(torch.tensor(bt["z_trg"]))
        z_trg2 = _cast(torch.tensor(bt["z_trg2"]))

        x_real = x_privs[it % len(batches)]
        masks = fan_priv.get_heatmap(x_real, Privacy=True)

        m = {}
        d_loss, d_lat = compute_d_loss(
            nets, args, x_real, y_trg, y_trg, z_trg=z_trg, masks=masks,
            x_real_org=x_ref,
        )
        reset_grad(); d_loss.backward(); optims["discriminator"].step()
        m.update({f"D/latent_{k}": v for k, v in d_lat.items()})

        d_loss, d_ref = compute_d_loss(
            nets, args, x_real, y_trg, y_trg, x_ref=x_ref, masks=masks,
            x_real_org=x_ref,
        )
        reset_grad(); d_loss.backward(); optims["discriminator"].step()
        m.update({f"D/ref_{k}": v for k, v in d_ref.items()})

        g_loss, g_lat, x_f = compute_g_loss(
            nets, args, x_real, y_org, y_trg, z_trgs=[z_trg, z_trg2],
            masks=masks, train=True,
        )
        # Heatmap L1 (solver.py:166-168): value-only — get_heatmap is
        # @torch.no_grad, so requires_grad_(True) makes a grad leaf.
        masks_fake = fan.get_heatmap(x_f[0])
        mse = F.l1_loss(masks_fake[0], masks[0]).requires_grad_(True) * 1000
        g_loss = g_loss + mse
        reset_grad(); g_loss.backward()
        optims["generator"].step()
        optims["mapping_network"].step()
        optims["style_encoder"].step()
        m.update({f"G/latent_{k}": v for k, v in g_lat.items()})
        m["G/latent_heatmap_l1"] = float(mse)

        g_loss, g_ref, x_f = compute_g_loss(
            nets, args, x_real, y_org, y_trg, x_refs=[x_ref, x_ref2],
            masks=masks, train=True,
        )
        lpips = _torch_lpips(feats, lin_w, x_ref, x_f[0]).abs() * args.lpips
        g_loss = g_loss + lpips
        reset_grad(); g_loss.backward(); optims["generator"].step()
        m.update({f"G/ref_{k}": v for k, v in g_ref.items()})
        m["G/ref_lpips"] = float(lpips)

        moving_average(nets["generator"], nets_ema["generator"], beta=0.999)
        moving_average(nets["mapping_network"], nets_ema["mapping_network"], beta=0.999)
        moving_average(nets["style_encoder"], nets_ema["style_encoder"], beta=0.999)
        if args.lambda_ds > 0:
            args.lambda_ds -= initial_lambda_ds / args.ds_iter
        history.append(m)
        sds_steps.append(
            {k: _sd(v) for k, v in nets.items() if k != "fan"}
        )
        import os as _os

        if _os.environ.get("PPVISION_DYNAMICS_PROBE"):
            print(f"  [torch ref iter {it} done]", flush=True)

    sds_final = dict(
        nets={k: _sd(v) for k, v in nets.items()},
        nets_ema={k: _sd(v) for k, v in nets_ema.items()},
    )
    x_privs_np = [np.transpose(x.numpy(), (0, 2, 3, 1)).copy() for x in x_privs]
    return history, sds_init, sds_steps, sds_final, x_privs_np


def _asj(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _convert_nets(sd_nets):
    """torch state-dicts (all 4 GAN nets) -> our param trees."""
    from ppvision_tpu.utils import torch_import as ti

    return {
        "generator": ti.generator_params_from_torch(
            sd_nets["generator"], IMG, MC, w_hpf=1.0),
        "mapping_network": ti.mapping_params_from_torch(
            sd_nets["mapping_network"], 2),
        "style_encoder": ti.style_encoder_params_from_torch(
            sd_nets["style_encoder"], IMG, 2, MC),
        "discriminator": ti.discriminator_params_from_torch(
            sd_nets["discriminator"], IMG, 2, MC),
    }


def _import_initial_state(sds):
    from ppvision_tpu.utils import torch_import as ti

    params = _asj(_convert_nets(sds["nets"]))
    fan_params = _asj(ti.fan_params_from_torch(sds["fan"]))
    fan_priv_params = _asj(ti.fan_params_from_torch(sds["fan_priv"]))
    camera_params = _asj(ti.camera_params_from_torch(sds["camera"]))
    lpips_params = _asj(ti.lpips_params_from_torch(
        sds["alexnet"], sds["lpips_lin"]))
    return params, fan_params, fan_priv_params, camera_params, lpips_params


@pytest.mark.slow  # ~20 torch solver iters + one jit compile (CPU)
def test_gan_training_trajectory_matches_reference():
    import os

    probe = bool(os.environ.get("PPVISION_DYNAMICS_PROBE"))
    batches = _make_batches(3, B, LAT)
    history, sds, sds_steps, sds_final, x_privs = _run_reference(batches)

    from ppvision_tpu.config import (
        CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from ppvision_tpu.optics.camera import CameraSpec, make_camera_constants
    from ppvision_tpu.train.aux_losses import build_lpips_fn
    from ppvision_tpu.train.gan import FrozenNets, init_gan, make_train_step

    cfg = FaceDeIdConfig(
        model=ModelConfig(
            img_size=IMG, style_dim=STYLE, latent_dim=LAT, max_conv_dim=MC,
            fan_input_size=256,  # reference wing.py:244 resizes to 256
            compute_dtype="float32",
        ),
        camera=CameraConfig(n=IMG, zernike_terms=TERMS),
        loss=LossConfig(
            lambda_reg=1.0, lambda_sty=1.0, lambda_ds=1.0, lambda_cyc=7.0,
            ds_iter=8, lambda_lpips=2000.0, lambda_heatmap=1000.0,
        ),
    )
    models, fan, state = init_gan(jax.random.key(0), cfg)
    params, fan_p, fan_priv_p, cam_p, lpips_p = _import_initial_state(sds)
    state = state.replace(
        params=params,
        ema_params={k: jax.tree_util.tree_map(jnp.copy, params[k])
                    for k in ("generator", "mapping_network", "style_encoder")},
    )
    spec = CameraSpec(n=IMG, zernike_terms=TERMS)
    frozen = FrozenNets(
        camera_params=cam_p,
        camera_consts=make_camera_constants(spec),
        fan_params=fan_p,
        fan_priv_params=fan_priv_p,
    )
    lpips_fn, _ = build_lpips_fn(IMG, params=lpips_p)
    step = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=None)

    jax_batches = [
        dict(bt, x_priv=x_privs[i]) for i, bt in enumerate(batches)
    ]

    def _lr(net):
        return 1e-6 if net == "mapping_network" else 1e-4

    # Teacher-forced per-step equivalence, ALL steps.  (A free-running
    # comparison is impossible in f32: measured worst loss rel-err is
    # 0.05 at step 0, 0.78 at step 1, 7.2 at step 2 — chaos, not bugs;
    # see the module docstring.)  Before each iteration the params are
    # re-synced to the torch trajectory, so every one of the 20 steps
    # checks the full dynamics operator — loss soup, Adam (bias
    # correction, pre-moment weight decay), sub-step ordering, lambda_ds
    # decay, EMA — at the exact state the reference visited, with only
    # single-step f32 noise.
    tstate = state
    for it in range(STEPS):
        tstate, metrics = step(tstate, frozen, jax_batches[it % len(batches)])
        # (1) every loss metric, computed at identical parameters
        for k, want in history[it].items():
            assert k in metrics, f"metric {k} missing at step {it}"
            got = float(metrics[k])
            err = abs(got - want) / max(abs(want), 1e-3)
            tol = FORCED_METRIC_TOL[k.split("_")[0]]
            if probe:
                print(f"  step {it:2d} {k:24s} rel_err {err:.3e}")
            else:
                assert err < tol, (it, k, got, want, err)
        # (2) the one-step parameter update of every net
        ref_p = _asj(_convert_nets(sds_steps[it]))
        for net, bound in FORCED_BOUNDS.items():
            diff = np.concatenate([
                np.abs(np.asarray(a) - np.asarray(b)).ravel()
                for a, b in zip(jax.tree_util.tree_leaves(tstate.params[net]),
                                jax.tree_util.tree_leaves(ref_p[net]))])
            lr = _lr(net)
            flipped = float((diff > lr).mean())
            p50 = float(np.quantile(diff, 0.5))
            if probe:
                print(f"  step {it:2d} {net:16s} mean {diff.mean()/lr:.4f}lr "
                      f"p50 {p50/lr:.4f}lr p99 {np.quantile(diff, 0.99)/lr:.4f}lr "
                      f"max {diff.max()/lr:.2f}lr frac>lr {flipped:.5f}")
            else:
                assert diff.mean() < bound["mean"] * lr, (
                    it, net, float(diff.mean() / lr))
                assert flipped < bound["flip"], (it, net, flipped)
                assert p50 < bound["p50"] * lr, (it, net, p50 / lr)
        # re-sync: next iteration starts exactly on the torch trajectory
        tstate = tstate.replace(params=ref_p)

    # --- EMA after 20 steps -------------------------------------------
    # The EMA lerp runs on OUR post-step params each iteration (before
    # the re-sync), so its error is the non-compounding (1-beta)-scaled
    # accumulation of the per-step noise above.
    ref_ema = _convert_nets({**sds_final["nets"], **sds_final["nets_ema"]})
    for net in ("generator", "mapping_network", "style_encoder"):
        diff = np.concatenate(
            [np.abs(np.asarray(a) - np.asarray(b)).ravel()
             for a, b in zip(
                 jax.tree_util.tree_leaves(tstate.ema_params[net]),
                 jax.tree_util.tree_leaves(_asj(ref_ema[net])))])
        if probe:
            print(f"  ema {net:16s} mean {diff.mean():.3e} max {diff.max():.3e}")
        else:
            assert diff.max() < EMA_MAX_TOL, (net, float(diff.max()))


if __name__ == "__main__":
    # The session sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel);
    # probe runs must use CPU like the pytest conftest does — on the
    # TPU backend the default-precision MXU matmuls round operands to
    # bf16 and the measured "divergence" is precision, not semantics.
    jax.config.update("jax_platforms", "cpu")
    test_gan_training_trajectory_matches_reference()
