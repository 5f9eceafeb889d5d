"""FREE-RUNNING f64 GAN training-trajectory golden vs the live torch
reference.

Complement to the teacher-forced 20-step golden
(test_train_dynamics_golden.py): that test re-syncs to the torch
trajectory before every iteration, so a constant small bias in one loss
term would be absorbed by the re-sync and never compound.  Here BOTH
sides run the identical reference recipe
(Face-DeId/core/solver.py:136-193) at FLOAT64 — torch ``.double()``,
JAX x64 — for several steps with NO re-sync.  At f64 the
cross-framework noise floor drops from ~1e-6 to ~1e-15 relative, which
opens a FAITHFUL WINDOW of three full free-running steps (measured:
9e-10 / 2e-8 / 9e-7 max rel err at steps 0/1/2) before the recipe's
intrinsic chaos — the early-Adam sign(g)*lr kick cascade, see the
tolerance comment — takes over; f32 diverges inside step 1.  A
compounding bias in any loss term, optimizer detail, or sub-step
ordering would appear at step 0 as an error floor (resolvable here to
~1e-9 relative) and grow through the window, which teacher-forcing can
mask but this test cannot.

Precision plumbing this test relies on (production code):
- coord constants use the reference's exact f32 arithmetic, promoted
  (models/fan.py::_coord_channels);
- resize matrices, IN statistics, LPIPS normalization constants, and
  the lambda_ds schedule all follow the working dtype to f64;
- ``torch_import.preserve_float64`` keeps checkpoint conversion at
  double precision.

Tolerances were set from a probe run (PPVISION_DYNAMICS_PROBE=1 prints
the measured error distributions) with ~10x margin; see the constants.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from .test_train_dynamics_golden import (
    B,
    IMG,
    LAT,
    MC,
    STYLE,
    TERMS,
    _make_batches,
    _run_reference,
)

FSTEPS = 4

# Measured probe maxima (rel err over all metrics at each step):
# step 0: 9.1e-10, step 1: 2.2e-8, step 2: 9.3e-7 — smooth Lyapunov
# growth (~1.5 decades/step) from the ~1e-15 f64 reassociation floor.
# At step 3 the early-Adam sign-kick cascade fires (at t~1 Adam's
# update is sign(g)*lr per coordinate; once the accumulated param
# difference crosses the |g| of enough near-zero-gradient coordinates,
# their updates flip sign and diverge by 2*lr at once): measured
# step 3 max 3.3e-2, step 4+ O(0.1-1) — chaos intrinsic to the recipe,
# NOT implementation error (the teacher-forced 20-step golden bounds
# every step at re-synced states).  f64 buys a 3-step faithful window
# (f32 diverges within step 1); a constant additive bias epsilon in
# any loss term would appear at step 0 as a floor of epsilon/|loss| —
# this test resolves biases down to ~1e-9 relative.
METRIC_REL_TOL = [1e-8, 3e-7, 2e-5, 0.5]
# After the free run all losses must still be finite and the EMA
# params near the reference (EMA's (1-beta)=1e-3 dilution keeps it in
# the faithful regime far longer; probe max 3.3e-6 absolute).
EMA_ABS_TOL = 1e-4


def _convert_nets_f64(sd_nets):
    from ppvision_tpu.utils import torch_import as ti

    with ti.preserve_float64():
        trees = {
            "generator": ti.generator_params_from_torch(
                sd_nets["generator"], IMG, MC, w_hpf=1.0),
            "mapping_network": ti.mapping_params_from_torch(
                sd_nets["mapping_network"], 2),
            "style_encoder": ti.style_encoder_params_from_torch(
                sd_nets["style_encoder"], IMG, 2, MC),
            "discriminator": ti.discriminator_params_from_torch(
                sd_nets["discriminator"], IMG, 2, MC),
        }
    return jax.tree_util.tree_map(jnp.asarray, trees)


@pytest.mark.slow  # ~6 torch double solver iters + one f64 jit (CPU)
def test_gan_free_running_f64_matches_reference():
    probe = bool(os.environ.get("PPVISION_DYNAMICS_PROBE"))
    batches = _make_batches(3, B, LAT)
    history, sds, sds_steps, sds_final, x_privs = _run_reference(
        batches, dbl=True, steps=FSTEPS
    )

    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        # jax.experimental.enable_x64 was removed; toggle the config
        # flag and restore it so the rest of the suite stays f32.
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        from ppvision_tpu.config import (
            CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig,
        )
        from ppvision_tpu.optics.camera import CameraSpec, make_camera_constants
        from ppvision_tpu.train.aux_losses import build_lpips_fn
        from ppvision_tpu.train.gan import (
            EMA_NETS, GAN_NETS, FrozenNets, init_gan, make_optimizers,
            make_train_step,
        )
        from ppvision_tpu.utils import torch_import as ti

        cfg = FaceDeIdConfig(
            model=ModelConfig(
                img_size=IMG, style_dim=STYLE, latent_dim=LAT,
                max_conv_dim=MC, fan_input_size=256,
                compute_dtype="float64",
            ),
            camera=CameraConfig(n=IMG, zernike_terms=TERMS),
            loss=LossConfig(
                lambda_reg=1.0, lambda_sty=1.0, lambda_ds=1.0,
                lambda_cyc=7.0, ds_iter=8, lambda_lpips=2000.0,
                lambda_heatmap=1000.0,
            ),
        )
        models, fan, state = init_gan(jax.random.key(0), cfg)

        params = _convert_nets_f64(sds["nets"])
        with ti.preserve_float64():
            fan_p = ti.fan_params_from_torch(sds["fan"])
            fan_priv_p = ti.fan_params_from_torch(sds["fan_priv"])
            lpips_p = ti.lpips_params_from_torch(
                sds["alexnet"], sds["lpips_lin"])
        fan_p, fan_priv_p, lpips_p = jax.tree_util.tree_map(
            jnp.asarray, (fan_p, fan_priv_p, lpips_p)
        )
        leaf = jax.tree_util.tree_leaves(params["generator"])[0]
        assert leaf.dtype == jnp.float64, leaf.dtype

        # Optimizer states must be re-initialized from the f64 params
        # (init_gan built them from its own f32 inits: f32 moments).
        optims = make_optimizers(cfg)
        state = state.replace(
            params=params,
            opt_states={k: optims[k].init(params[k]) for k in GAN_NETS},
            ema_params={
                k: jax.tree_util.tree_map(jnp.copy, params[k])
                for k in EMA_NETS
            },
        )
        spec = CameraSpec(n=IMG, zernike_terms=TERMS)
        frozen = FrozenNets(
            camera_params=jax.tree_util.tree_map(
                jnp.asarray,
                ti.camera_params_from_torch(sds["camera"]),
            ),
            camera_consts=make_camera_constants(spec),
            fan_params=fan_p,
            fan_priv_params=fan_priv_p,
        )
        lpips_fn, _ = build_lpips_fn(IMG, params=lpips_p)
        step = make_train_step(models, fan, cfg, lpips_fn=lpips_fn, flow_fn=None)

        jax_batches = [
            {
                k: (np.asarray(v, np.float64)
                    if np.asarray(v).dtype == np.float32 else v)
                for k, v in dict(bt, x_priv=x_privs[i]).items()
            }
            for i, bt in enumerate(batches)
        ]

        tstate = state
        worst = 0.0
        for it in range(FSTEPS):
            tstate, metrics = step(tstate, frozen, jax_batches[it % len(batches)])
            for k, want in history[it].items():
                assert k in metrics, f"metric {k} missing at step {it}"
                got = float(metrics[k])
                err = abs(got - want) / max(abs(want), 1e-3)
                worst = max(worst, err)
                if probe:
                    print(f"  step {it} {k:24s} rel_err {err:.3e}")
                else:
                    assert err < METRIC_REL_TOL[it], (it, k, got, want, err)

        # Post-run state: every trained param finite (the post-cascade
        # trajectory is chaotic but must stay healthy), and the EMA —
        # whose (1-beta)=1e-3 dilution keeps it inside the faithful
        # regime far longer — still close to the reference's EMA.
        ema = _convert_nets_f64(
            {**sds_final["nets"], **sds_final["nets_ema"]}
        )
        for net in GAN_NETS:
            for a in jax.tree_util.tree_leaves(tstate.params[net]):
                assert bool(jnp.all(jnp.isfinite(a))), net
        for net in EMA_NETS:
            diff = max(
                float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(
                    jax.tree_util.tree_leaves(tstate.ema_params[net]),
                    jax.tree_util.tree_leaves(ema[net]),
                )
            )
            if probe:
                print(f"  ema   {net:16s} max {diff:.3e}")
            else:
                assert diff < EMA_ABS_TOL, (net, diff)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    test_gan_free_running_f64_matches_reference()
