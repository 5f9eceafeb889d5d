"""End-to-end CLI training smoke: full paper loss, debug grid, resume.

Runs ``run_train`` twice on synthetic image folders: 2 fresh steps
(LPIPS + flow terms active, debug grid written, checkpoints saved),
then a resume that must pick up from the saved step.
"""

import os

import numpy as np
import pytest
from PIL import Image

from ppvision_tpu.config import (
    CameraConfig,
    FaceDeIdConfig,
    LossConfig,
    ModelConfig,
    PathsConfig,
    TrainConfig,
)

IMG = 32


def _make_dataset(root, domains=("cat", "dog"), n=3, size=40, seed=0):
    rng = np.random.default_rng(seed)
    for d in domains:
        os.makedirs(os.path.join(root, d), exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, d, f"{i}.png"))


@pytest.mark.slow
def test_run_train_full_loss_and_resume(tmp_path, capsys):
    from ppvision_tpu.cli.main import run_train

    data = str(tmp_path / "data")
    _make_dataset(data)
    ckdir = str(tmp_path / "ck")
    cfg = FaceDeIdConfig(
        model=ModelConfig(
            img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8
        ),
        camera=CameraConfig(n=IMG, zernike_terms=16),
        loss=LossConfig(lambda_heatmap=0.0),
        train=TrainConfig(
            total_iters=2, batch_size=2, save_every=2, print_every=1,
            debug_every=2, use_lpips=True, use_flow=True, flow_iters=1,
        ),
        paths=PathsConfig(
            train_img_dir=data, ref_dir=data, checkpoint_save_dir=ckdir,
            debug_dir=str(tmp_path / "debug"),
            # Point at nonexistent ckpts -> loud random-init warnings.
            wing_path=str(tmp_path / "none.ckpt"),
            camera_ckpt=str(tmp_path / "none.pth"),
            lpips_path=str(tmp_path / "none1"), alexnet_path=str(tmp_path / "none2"),
            raft_path=str(tmp_path / "none3"),
        ),
    )
    run_train(cfg)
    out = capsys.readouterr()
    # Full paper loss: LPIPS and flow terms reported nonzero.
    assert "G/ref_lpips" in out.out and "flow" in out.out
    # Step checkpoints + debug grid written.
    assert os.path.isdir(os.path.join(ckdir, "000002_nets"))
    assert os.path.exists(os.path.join(str(tmp_path / "debug"), "Img_2.svg"))
    # Loud warnings about missing pretrained artifacts.
    assert "RANDOM" in out.err

    # Resume: latest step (2) restores and training continues to 3.
    cfg3 = FaceDeIdConfig(
        model=cfg.model, camera=cfg.camera, loss=cfg.loss,
        train=TrainConfig(
            total_iters=3, batch_size=2, save_every=3, print_every=1,
            debug_every=0, use_lpips=False, use_flow=False,
        ),
        paths=cfg.paths,
    )
    run_train(cfg3)
    out = capsys.readouterr()
    assert "Resumed training from step 2" in out.out
    assert os.path.isdir(os.path.join(ckdir, "000003_nets"))


@pytest.mark.slow
def test_run_sample_writes_outputs(tmp_path, capsys):
    from ppvision_tpu.cli.main import run_sample

    data = str(tmp_path / "data")
    _make_dataset(data, domains=("cat",), n=4)
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
        train=TrainConfig(val_batch_size=2),
        paths=PathsConfig(
            src_dir=os.path.join(data, "cat"), ref_dir=os.path.join(data, "cat"),
            result_dir=str(tmp_path / "res"),
            checkpoint_save_dir=str(tmp_path / "none"),
            wing_path=str(tmp_path / "no.ckpt"), camera_ckpt=str(tmp_path / "no.pth"),
        ),
    )
    run_sample(cfg, num_batches=1)
    files = os.listdir(str(tmp_path / "res"))
    assert any(f.startswith("reference_") for f in files)
    assert any(f.startswith("ref0_") for f in files)


@pytest.mark.slow
def test_run_sample_video_writes_sequence(tmp_path):
    from ppvision_tpu.cli.main import run_sample

    data = str(tmp_path / "data")
    _make_dataset(data, domains=("cat",), n=4)
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32, style_dim=8),
        camera=CameraConfig(n=IMG, zernike_terms=16),
        train=TrainConfig(val_batch_size=4, flow_iters=1),
        paths=PathsConfig(
            src_dir=os.path.join(data, "cat"), ref_dir=os.path.join(data, "cat"),
            result_dir=str(tmp_path / "res"),
            checkpoint_save_dir=str(tmp_path / "none"),
            wing_path=str(tmp_path / "no.ckpt"), camera_ckpt=str(tmp_path / "no.pth"),
            raft_path=str(tmp_path / "no_raft.pth"),
        ),
    )
    run_sample(cfg, video=True)
    # mp4s exist only if ffmpeg is installed; the interp video path and
    # flow consistency must run either way (no exception == pass).
