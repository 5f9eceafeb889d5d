"""Eval orchestration: metric keys, multi-output path, random-net guard."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid
from ppvision_tpu.metrics.eval_gan import calculate_metrics

IMG = 32


def _val_dir(tmp_path, n=2, size=40):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "val")
    for d in ("cat", "dog"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, d, f"{i}.png"))
    return root


@pytest.fixture(scope="module")
def bundle():
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
    )
    return build_deid(jax.random.key(0), cfg)


def test_refuses_random_metric_nets(tmp_path):
    # The guard fires before the bundle is touched, so a dummy suffices
    # (building a real bundle costs ~50 s of compile on 1 CPU — keep
    # this in the fast tier).
    import types

    root = _val_dir(tmp_path)
    dummy = types.SimpleNamespace(cfg=None, params=None)
    with pytest.raises(RuntimeError, match="allow_random_metrics"):
        calculate_metrics(dummy, None, root, num_outs=2, batch_size=2)


@pytest.mark.slow
def test_calculate_metrics_latent_and_reference(bundle, tmp_path):
    root = _val_dir(tmp_path)
    for mode in ("latent", "reference"):
        res = calculate_metrics(
            bundle, bundle.params, root, mode=mode, num_outs=2, batch_size=2,
            allow_random_metrics=True, out_dir=str(tmp_path / f"out_{mode}"),
        )
        for task in ("cat2dog", "dog2cat"):
            assert f"LPIPS_{mode}/{task}" in res
            assert f"FaceIDcos_{mode}/{task}" in res
            assert np.isfinite(res[f"FaceIDcos_{mode}/{task}"])
            assert -1.0 <= res[f"FaceIDcos_{mode}/{task}"] <= 1.0
            # FID is per (src -> trg) task (reference eval.py:123-148).
            assert f"FID_{mode}/{task}" in res and np.isfinite(res[f"FID_{mode}/{task}"])
        assert os.path.exists(
            os.path.join(str(tmp_path / f"out_{mode}"), f"metrics_{mode}_0.json")
        )
        # ALL num_outs styles per source dumped, reference naming
        # '%.4i_%.2i.png' (eval.py:85-93): 2 sources x 2 styles per task.
        dumped = sorted(os.listdir(tmp_path / f"out_{mode}" / "cat2dog"))
        assert dumped == sorted(
            "%.4i_%.2i.png" % (i, j) for i in (1, 2) for j in (1, 2)
        ), dumped


@pytest.mark.slow
def test_calculate_metrics_aligned_face_id(bundle, tmp_path):
    """align_fan_params switches the face-ID embed to the FAN-landmark
    ArcFace-template pipeline; keys and value ranges are unchanged."""
    root = _val_dir(tmp_path)
    res = calculate_metrics(
        bundle, bundle.params, root, mode="latent", num_outs=2, batch_size=2,
        allow_random_metrics=True, out_dir=str(tmp_path / "out_aligned"),
        align_fan_params=bundle.params.fan_priv,
    )
    for task in ("cat2dog", "dog2cat"):
        v = res[f"FaceIDcos_latent/{task}"]
        assert np.isfinite(v) and -1.0 <= v <= 1.0


def test_run_eval_aligned_needs_wing_ckpt(tmp_path):
    """--aligned_face_id must fail fast (before the bundle build) when
    the wing checkpoint is absent."""
    import dataclasses

    from ppvision_tpu.cli.main import run_eval
    from ppvision_tpu.config import FaceDeIdConfig

    cfg = FaceDeIdConfig()
    cfg = dataclasses.replace(
        cfg,
        paths=dataclasses.replace(
            cfg.paths, wing_path=str(tmp_path / "missing_wing.ckpt")
        ),
    )
    with pytest.raises(FileNotFoundError, match="aligned_face_id"):
        run_eval(cfg, aligned_face_id=True)
