"""END-TO-END golden parity: the full de-id pipeline (camera -> fan_priv
heatmaps -> style encoder -> generator) vs the live PyTorch reference,
weights converted 1:1 — the BASELINE.json "SSIM parity" certification.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import DeIdParams, build_deid, deid_from_reference
from ppvision_tpu.metrics.psnr_ssim import ssim
from ppvision_tpu.optics import camera as cam
from ppvision_tpu.utils import torch_import as ti

from .golden_reference import (
    import_face_deid_camera,
    import_face_deid_models,
)

IMG = 64
STYLE = 8
TERMS = 16


@pytest.mark.slow
def test_full_deid_pipeline_matches_reference():
    torch.manual_seed(0)
    TorchCamera = import_face_deid_camera()
    ref_model, ref_wing = import_face_deid_models()

    cam_t = TorchCamera(device="cpu", N=IMG, zernike_terms=TERMS)
    wing_t = ref_wing.FAN().eval()
    gen_t = ref_model.Generator(IMG, STYLE, w_hpf=1).eval()
    senc_t = ref_model.StyleEncoder(IMG, STYLE, 2).eval()

    rng = np.random.default_rng(0)
    x_src = rng.uniform(size=(2, IMG, IMG, 3)).astype(np.float32)
    x_ref = rng.uniform(size=(2, IMG, IMG, 3)).astype(np.float32)
    y_ref = np.array([0, 1])

    # --- reference pipeline (solver.py:144-147 + utils.py:158-181) ---
    with torch.no_grad():
        xs_t = torch.from_numpy(x_src).permute(0, 3, 1, 2)
        xr_t = torch.from_numpy(x_ref).permute(0, 3, 1, 2)
        x_real_t = cam_t(xs_t)
        masks_t = wing_t.get_heatmap(x_real_t, Privacy=True)
        s_t = senc_t(xr_t, torch.from_numpy(y_ref))
        fake_t = gen_t(x_real_t, s_t, masks=masks_t)
    ref_out = fake_t.permute(0, 2, 3, 1).numpy()

    # --- ours, with the SAME weights (converted) ---
    cfg = FaceDeIdConfig(
        model=ModelConfig(
            img_size=IMG, style_dim=STYLE, compute_dtype="float32"
        ),
        camera=CameraConfig(n=IMG, zernike_terms=TERMS),
    )
    bundle = build_deid(jax.random.key(0), cfg)
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}  # noqa: E731
    params = DeIdParams(
        camera=ti.camera_params_from_torch(sd(cam_t)),
        camera_consts=bundle.params.camera_consts,
        fan_priv=as_jnp(ti.fan_params_from_torch(sd(wing_t))),
        generator=as_jnp(
            ti.generator_params_from_torch(sd(gen_t), img_size=IMG, w_hpf=1.0)
        ),
        mapping_network=bundle.params.mapping_network,
        style_encoder=as_jnp(
            ti.style_encoder_params_from_torch(sd(senc_t), img_size=IMG, num_domains=2)
        ),
    )
    ours = np.asarray(
        deid_from_reference(
            bundle, params, jnp.asarray(x_src), jnp.asarray(x_ref),
            jnp.asarray(y_ref),
        )
    )

    assert ours.shape == ref_out.shape
    # The only irreducible residual is the camera's f32-vs-f64 chirp
    # rounding (see test_camera_golden); after FAN + generator it stays
    # small: pixel correlation ~1 and SSIM parity.
    corr = np.corrcoef(ours.ravel(), ref_out.ravel())[0, 1]
    assert corr > 0.995, corr
    a = jnp.asarray(np.clip(ours * 0.5 + 0.5, 0, 1))
    b = jnp.asarray(np.clip(ref_out * 0.5 + 0.5, 0, 1))
    s = float(ssim(a, b))
    assert s > 0.98, s
    # Tail pixels amplify the camera residual through the high-pass
    # skips; bound the bulk tightly and the tail loosely.
    diff = np.abs(ours - ref_out)
    assert np.quantile(diff, 0.99) < 0.1, np.quantile(diff, 0.99)
    assert diff.max() < 0.5, diff.max()
