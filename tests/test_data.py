"""Data pipeline tests with synthetic datasets."""

import json
import os

import numpy as np
import pytest

from ppvision_tpu.data.caption import CaptionDataset, base_name, caption_batches, create_input_files
from ppvision_tpu.data.face import (
    FaceBatcher,
    ImageFolderDataset,
    ReferenceDataset,
    eval_batches,
)


def _write_img(path, color, size=(40, 48)):
    from PIL import Image

    arr = np.full((size[0], size[1], 3), color, np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def face_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("faces")
    for split in ("src", "ref"):
        for dom, color in (("female", 60), ("male", 180)):
            d = root / split / dom
            d.mkdir(parents=True)
            n = 6 if dom == "female" else 3  # imbalanced on purpose
            for i in range(n):
                _write_img(str(d / f"{i}.png"), color + i)
    return root


def test_image_folder_and_reference(face_root):
    ds = ImageFolderDataset(str(face_root / "src"))
    assert len(ds) == 9
    assert ds.classes == ["female", "male"]
    assert sum(ds.targets) == 3  # three male images

    ref = ReferenceDataset(str(face_root / "ref"), seed=0)
    assert len(ref.samples2) == len(ref.samples)
    # samples2 are a within-domain permutation.
    for s2, t in zip(ref.samples2, ref.targets):
        assert f"/{ref.classes[t]}/" in s2


def test_face_batcher_payload(face_root):
    fb = FaceBatcher(
        str(face_root / "src"), str(face_root / "ref"),
        img_size=32, batch_size=4, latent_dim=8, seed=1,
    )
    batch = next(fb)
    fb.close()
    assert batch["x_src"].shape == (4, 32, 32, 3)
    assert batch["x_ref2"].shape == (4, 32, 32, 3)
    assert batch["z_trg"].shape == (4, 8)
    assert batch["x_src"].dtype == np.float32
    assert 0.0 <= batch["x_src"].min() and batch["x_src"].max() <= 1.0
    assert set(np.unique(batch["y_src"])) <= {0, 1}
    # Fresh gaussians each batch.
    assert np.abs(batch["z_trg"] - batch["z_trg2"]).max() > 0


def test_eval_batches(face_root):
    batches = list(eval_batches(str(face_root / "src"), img_size=32, batch_size=4))
    assert sum(b.shape[0] for b in batches) == 9
    norm = next(
        eval_batches(str(face_root / "src"), img_size=32, batch_size=2, imagenet_normalize=True)
    )
    assert norm.shape[1:] == (299, 299, 3)
    assert norm.min() < 0  # normalized


@pytest.fixture(scope="module")
def caption_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    imgdir = root / "imgs"
    imgdir.mkdir()
    images = []
    rng = np.random.default_rng(0)
    for i in range(6):
        fname = f"im{i}.jpg"
        _write_img(str(imgdir / fname), int(rng.integers(0, 200)))
        split = ["train", "train", "train", "val", "test", "restval"][i]
        sents = [
            {"tokens": ["a", "dog", "runs"] + (["fast"] if i % 2 else [])},
            {"tokens": ["the", "dog", "is", "running"]},
        ]
        images.append({"filename": fname, "split": split, "sentences": sents})
    kj = root / "karpathy.json"
    kj.write_text(json.dumps({"images": images}))
    out = root / "out"
    create_input_files(
        "flickr8k", str(kj), str(imgdir), captions_per_image=3,
        min_word_freq=0, output_folder=str(out), max_len=10, image_size=32,
    )
    return out


def test_create_input_files_and_dataset(caption_data):
    base = base_name("flickr8k", 3, 0)
    with open(caption_data / f"WORDMAP_{base}.json") as f:
        wm = json.load(f)
    assert wm["<pad>"] == 0
    assert {"<unk>", "<start>", "<end>"} <= set(wm)

    ds = CaptionDataset(str(caption_data), base, "TRAIN")
    assert len(ds) == 4 * 3  # 4 train(+restval) images x 3 caps
    img, cap, cl = ds[0]
    assert img.shape == (32, 32, 3) and img.max() <= 1.0
    assert cap[0] == wm["<start>"]
    assert cap[cl - 1] == wm["<end>"]

    val = CaptionDataset(str(caption_data), base, "VAL")
    _, _, _, allcaps = val[0]
    assert allcaps.shape[0] == 3

    batches = list(caption_batches(ds, batch_size=4, shuffle=True, seed=0))
    assert all(b["images"].shape[0] == 4 for b in batches)
    assert batches[0]["captions"].shape[1] == 12  # max_len 10 + start/end


def test_face_batcher_native_matches_pil(face_root):
    """Native and PIL batchers draw the same randomness and agree."""
    from ppvision_tpu.data import native

    if not native.available():
        pytest.skip("no native lib")
    kw = dict(img_size=32, batch_size=4, latent_dim=8, seed=7)
    fb_pil = FaceBatcher(str(face_root / "src"), str(face_root / "ref"), use_native=False, **kw)
    b_pil = next(fb_pil)
    fb_pil.close()
    fb_nat = FaceBatcher(str(face_root / "src"), str(face_root / "ref"), use_native=True, **kw)
    b_nat = next(fb_nat)
    fb_nat.close()
    for k in ("x_src", "x_ref", "x_ref2"):
        np.testing.assert_allclose(b_nat[k], b_pil[k], atol=1e-6)
    np.testing.assert_array_equal(b_nat["y_src"], b_pil["y_src"])


def test_api_edge_validation():
    """Clear errors at API edges instead of deep XLA shape failures."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ppvision_tpu.utils.validate import check_image_batch, check_labels, check_styles

    ok = jnp.zeros((2, 32, 32, 3))
    check_image_batch(ok, "x", size=32)
    with pytest.raises(ValueError, match="NCHW"):
        check_image_batch(jnp.zeros((2, 3, 32, 32)), "x")
    with pytest.raises(ValueError, match="4 dims"):
        check_image_batch(jnp.zeros((32, 32, 3)), "x")
    with pytest.raises(ValueError, match="divide uint8"):
        check_image_batch(jnp.zeros((2, 32, 32, 3), jnp.uint8), "x")
    with pytest.raises(ValueError, match="32x32"):
        check_image_batch(jnp.zeros((2, 16, 16, 3)), "x", size=32)
    check_labels(jnp.zeros((2,), jnp.int32), "y", batch=2)
    with pytest.raises(ValueError, match="integer"):
        check_labels(jnp.zeros((2,)), "y")
    with pytest.raises(ValueError, match="batch mismatch"):
        check_labels(jnp.zeros((3,), jnp.int32), "y", batch=2)
    check_styles(jnp.zeros((2, 8)), "s", style_dim=8)
    with pytest.raises(ValueError, match="style_dim"):
        check_styles(jnp.zeros((2, 4)), "s", style_dim=8)

    # Checks are trace-compatible (static info only).
    def f(x):
        check_image_batch(x, "x")
        return x * 2

    jax.jit(f)(ok)


def test_create_input_files_custom_lab_split(tmp_path):
    """Lab-subset builder: first ``train_limit`` readable train-split
    images -> TRAIN, remaining train images -> VAL, no TEST
    (reference utils.py::create_input_files_custom ~:153-307)."""
    from ppvision_tpu.data.caption import create_input_files_custom

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    images = []
    for i in range(5):
        fname = f"im{i}.jpg"
        _write_img(str(imgdir / fname), 40 + i)
        split = ["train", "train", "train", "val", "test"][i]
        images.append({
            "filename": fname, "split": split,
            "sentences": [{"tokens": ["a", "cat"]}, {"tokens": ["the", "cat", "sits"]}],
        })
    # A corrupt train image must not consume a TRAIN slot.
    (imgdir / "im_bad.jpg").write_bytes(b"not an image")
    images.insert(0, {
        "filename": "im_bad.jpg", "split": "train",
        "sentences": [{"tokens": ["bad"]}],
    })
    kj = tmp_path / "karpathy.json"
    kj.write_text(json.dumps({"images": images}))
    out = tmp_path / "out"
    create_input_files_custom(
        "flickr8k", str(kj), str(imgdir), captions_per_image=2,
        min_word_freq=0, output_folder=str(out), max_len=10, image_size=32,
        train_limit=2,
    )
    base = base_name("flickr8k", 2, 0)
    train = CaptionDataset(str(out), base, "TRAIN")
    val = CaptionDataset(str(out), base, "VAL")
    assert len(train) == 2 * 2  # first 2 readable train imgs x 2 caps
    assert len(val) == 1 * 2  # the remaining train img
    assert not (out / f"TEST_IMAGES_{base}.hdf5").exists()
    with open(out / f"WORDMAP_{base}.json") as f:
        wm = json.load(f)
    # Word map counts EVERY caption in the JSON (incl. val/test/corrupt).
    assert "sits" in wm and "bad" in wm


@pytest.fixture(scope="module")
def face_root_jpg(tmp_path_factory):
    """JPEG-flavored dataset: exercises the fully-native bytes->batch path."""
    from PIL import Image

    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("faces_jpg")
    for split in ("src", "ref"):
        for dom in ("female", "male"):
            d = root / split / dom
            d.mkdir(parents=True)
            n = 5 if dom == "female" else 3
            for i in range(n):
                arr = rng.integers(0, 256, (45, 52, 3), np.uint8)
                Image.fromarray(arr).save(str(d / f"{i}.jpg"), quality=92)
    return root


def test_face_batcher_native_jpeg_matches_pil(face_root_jpg):
    """The fused native JPEG decode+transform path draws the same
    randomness as the PIL path and produces identical batches (libjpeg
    is the decoder on both sides)."""
    from ppvision_tpu.data import native

    if not (native.available() and native.has_jpeg()):
        pytest.skip("native lib built without libjpeg")
    kw = dict(img_size=32, batch_size=6, latent_dim=8, seed=3)
    fb_pil = FaceBatcher(
        str(face_root_jpg / "src"), str(face_root_jpg / "ref"),
        use_native=False, **kw,
    )
    b_pil = next(fb_pil)
    fb_pil.close()
    fb_nat = FaceBatcher(
        str(face_root_jpg / "src"), str(face_root_jpg / "ref"),
        use_native=True, **kw,
    )
    b_nat = next(fb_nat)
    fb_nat.close()
    for k in ("x_src", "x_ref", "x_ref2"):
        np.testing.assert_allclose(b_nat[k], b_pil[k], atol=1e-6)
    np.testing.assert_array_equal(b_nat["y_ref"], b_pil["y_ref"])
    np.testing.assert_allclose(b_nat["z_trg"], b_pil["z_trg"])
