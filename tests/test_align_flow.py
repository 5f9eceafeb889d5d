"""Aligner landmark extraction (golden vs reference) + flow aux tests."""

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
