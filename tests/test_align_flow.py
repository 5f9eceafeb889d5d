"""Aligner landmark extraction (golden vs reference) + flow aux tests."""

import os

import numpy as np
import pytest

from ppvision_tpu.data.flow import (
    FlowAugmentor,
    flow_to_image,
    read_flo,
    read_flow_kitti,
    write_flo,
    write_flow_kitti,
)
from ppvision_tpu.models.align import FaceAligner, heatmap_landmarks


def test_heatmap_landmarks_matches_reference():
    torch = pytest.importorskip("torch")
    from .golden_reference import import_face_deid_models

    _, ref_wing = import_face_deid_models()
    rng = np.random.default_rng(0)
    hm = rng.standard_normal((2, 5, 64, 64)).astype(np.float32)  # NCHW
    want = ref_wing.get_preds_fromhm(torch.tensor(hm)).numpy()
    got = np.asarray(heatmap_landmarks(np.transpose(hm, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_aligner_identity_transform():
    """Aligning against its own landmarks yields ~identity similarity."""
    from ppvision_tpu.models.fan import FAN

    rng = np.random.default_rng(1)
    lm = rng.uniform(40, 200, (98, 2)).astype(np.float32)
    aligner = FaceAligner.__new__(FaceAligner)
    aligner.ref = lm
    from ppvision_tpu.models.align import _xaxis

    aligner.ref_xaxis = _xaxis(lm)
    mat = FaceAligner.matrix(aligner, lm)
    np.testing.assert_allclose(mat, np.eye(3), atol=1e-5)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((8, 6, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_kitti_roundtrip(tmp_path):
    pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    flow = (rng.standard_normal((8, 6, 2)) * 3).astype(np.float32)
    valid = np.ones((8, 6), bool)
    p = str(tmp_path / "k.png")
    write_flow_kitti(p, flow, valid)
    back, v = read_flow_kitti(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64)
    assert v.all()


def test_flow_to_image():
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 1.0
    img = flow_to_image(flow)
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    # Uniform flow -> uniform color.
    assert (img == img[0, 0]).all()


def test_flow_augmentor():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img1 = rng.uniform(0, 255, (64, 80, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (64, 80, 3)).astype(np.float32)
    flow = rng.standard_normal((64, 80, 2)).astype(np.float32)
    aug = FlowAugmentor((48, 56), seed=0)
    a, b, f = aug(img1, img2, flow)
    assert a.shape == (48, 56, 3) and b.shape == (48, 56, 3) and f.shape == (48, 56, 2)
    assert a.min() >= 0 and a.max() <= 255


def test_mesh_helpers():
    import jax

    from ppvision_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    batch = {"x": np.zeros((8, 4, 4, 3)), "y": np.zeros((3,))}
    placed = shard_batch(mesh, batch)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert placed["y"].sharding.spec == jax.sharding.PartitionSpec()


def test_pfm_roundtrip(tmp_path):
    from ppvision_tpu.data.flow import read_pfm, write_pfm

    rng = np.random.default_rng(0)
    img = rng.standard_normal((12, 9, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_allclose(read_pfm(p), img, rtol=1e-7)
    gray = rng.standard_normal((7, 5)).astype(np.float32)
    write_pfm(p, gray)
    np.testing.assert_allclose(read_pfm(p), gray, rtol=1e-7)


def test_named_flow_datasets(tmp_path):
    """Sintel/KITTI layout indexing + sample loading (datasets.py:102-177)."""
    from PIL import Image

    from ppvision_tpu.data.flow import KITTI, MpiSintel, write_flo, write_flow_kitti

    rng = np.random.default_rng(1)

    def png(path, h=16, w=16):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)

    # Sintel: training/clean/sceneA/frame_{1,2,3}.png + flow .flo
    root = str(tmp_path / "Sintel")
    for i in range(3):
        png(f"{root}/training/clean/sceneA/frame_{i:04d}.png")
    for i in range(2):
        os.makedirs(f"{root}/training/flow/sceneA", exist_ok=True)
        write_flo(
            f"{root}/training/flow/sceneA/frame_{i:04d}.flo",
            rng.standard_normal((16, 16, 2)).astype(np.float32),
        )
    ds = MpiSintel(root=root, split="training", dstype="clean")
    assert len(ds) == 2
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (16, 16, 3) and flow.shape == (16, 16, 2)
    assert valid.min() >= 0 and valid.max() <= 1

    # KITTI: image_2/*_10.png/_11.png + flow_occ 16-bit png, sparse.
    kroot = str(tmp_path / "KITTI")
    png(f"{kroot}/training/image_2/000000_10.png")
    png(f"{kroot}/training/image_2/000000_11.png")
    os.makedirs(f"{kroot}/training/flow_occ", exist_ok=True)
    write_flow_kitti(
        f"{kroot}/training/flow_occ/000000_10.png",
        rng.uniform(-10, 10, (16, 16, 2)).astype(np.float32),
        valid=np.ones((16, 16)),
    )
    kds = KITTI(root=kroot, split="training")
    assert len(kds) == 1 and kds.sparse
    img1, img2, flow, valid = kds[0]
    assert flow.shape == (16, 16, 2) and valid.shape == (16, 16)

    # dataset algebra as the reference mixes stages (datasets.py:219)
    mixed = 3 * kds + ds
    assert len(mixed) == 5


def test_eraser_augmentation_occludes_img2():
    from ppvision_tpu.data.flow import FlowAugmentor

    aug = FlowAugmentor((16, 16), seed=3)
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    # Run the eraser alone many times; at least one run must modify img2
    # (p=0.5) and img1 must never change.
    changed = False
    for _ in range(10):
        o1, o2 = aug._eraser(img1, img2)
        assert o1 is img1
        changed = changed or not np.array_equal(o2, img2)
    assert changed


@pytest.mark.slow
def test_aligner_warp_matches_reference():
    """Full align() vs the reference FaceAligner (wing.py:328-467) on a
    non-trivial rotation+scale+translation, landmark nets bypassed with
    a shared fixed landmark set (FAN parity is golden-tested
    separately).  skimage is absent in this env, so the reference's
    ``gaussian`` is emulated with the same cv2 blur both sides use."""
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    import types

    import jax.numpy as jnp

    from .golden_reference import import_face_deid_models

    _, ref_wing = import_face_deid_models()

    size = 256
    rng = np.random.default_rng(7)

    # Smooth synthetic image (gradients + blobs): stable under LANCZOS
    # resampling, so uint8-vs-float rounding stays in the noise floor.
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(3 * xx + 1.5 * yy),
            0.5 + 0.4 * np.cos(2 * yy - xx),
            0.5 + 0.3 * np.exp(-(((xx - 0.5) ** 2 + (yy - 0.4) ** 2) / 0.05)),
        ],
        axis=-1,
    )
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    imgs = (arr.astype(np.float32) / 255.0 * 2.0 - 1.0)[None]

    # Reference landmark frame: plausible 98-point layout.
    ref_lm = rng.uniform(70.0, 190.0, (98, 2)).astype(np.float32)
    ref_lm[60:68] = np.array([96.0, 110.0]) + rng.uniform(-6, 6, (8, 2))
    ref_lm[96] = [96.0, 110.0]
    ref_lm[68:76] = np.array([160.0, 110.0]) + rng.uniform(-6, 6, (8, 2))
    ref_lm[97] = [160.0, 110.0]
    ref_lm[76] = [100.0, 178.0]
    ref_lm[82] = [156.0, 178.0]

    # Source landmarks: rotate 18 deg, scale 0.85, translate — the face
    # the aligner must bring back to the reference frame.
    th = np.deg2rad(18.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    center = ref_lm.mean(axis=0)
    src_lm = (ref_lm - center) @ rot.T * 0.85 + center + np.array([7.0, -5.0])
    src_lm = src_lm.astype(np.float32)

    # --- our aligner, landmark net stubbed ---
    from ppvision_tpu.models.align import FaceAligner, _xaxis

    ours = FaceAligner.__new__(FaceAligner)
    ours.ref = ref_lm.copy()
    ours.ref_xaxis = _xaxis(ours.ref)
    ours.output_size = size
    ours._landmark_fn = lambda x: jnp.asarray(src_lm[None])
    got = FaceAligner.align(ours, imgs.copy())[0]

    # --- reference aligner, FAN + skimage stubbed ---
    orig_gaussian = ref_wing.gaussian

    def cv2_gaussian(x, sigma, multichannel=True):
        x = x.astype(np.float32)
        out = cv2.GaussianBlur(x, (0, 0), sigma) if sigma > 0 else x
        return out / 255.0  # skimage uint8 handling: [0,1] output

    ref_wing.gaussian = cv2_gaussian
    try:
        ra = ref_wing.FaceAligner.__new__(ref_wing.FaceAligner)
        ra.device = torch.device("cpu")
        ra.CELEB_REF = ref_lm.copy()
        ra.xaxis_ref = ref_wing.landmarks2xaxis(ra.CELEB_REF)
        ra.output_size = size
        ra.fan = types.SimpleNamespace(
            get_landmark=lambda t: torch.tensor(src_lm[None])
        )
        t_imgs = torch.tensor(np.transpose(imgs, (0, 3, 1, 2)).copy())
        want = ra.align(t_imgs).numpy()[0].transpose(1, 2, 0)
    finally:
        ref_wing.gaussian = orig_gaussian

    # Transform matrices must agree to float precision.
    np.testing.assert_allclose(
        FaceAligner.matrix(ours, src_lm + np.array([size // 2, size // 2])),
        ra.landmarks2mat(src_lm + np.array([size // 2, size // 2])),
        rtol=1e-5, atol=1e-5,
    )
    diff = np.abs(got - want)
    assert diff.mean() < 0.01, diff.mean()
    assert diff.max() < 0.1, diff.max()
