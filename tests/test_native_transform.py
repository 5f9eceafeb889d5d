"""Native C++ batch transform: build, PIL-exactness, batch path."""

import numpy as np
import pytest

from ppvision_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the native lib"
)


def _pil_resize(img, crop, out_hw, flip):
    from PIL import Image

    cy, cx, ch, cw = crop
    im = Image.fromarray(img[cy : cy + ch, cx : cx + cw])
    im = im.resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    arr = np.asarray(im).astype(np.float32) / 255.0
    if flip:
        arr = arr[:, ::-1]
    return arr


@pytest.mark.parametrize("out_hw", [(32, 32), (64, 48), (100, 100)])
@pytest.mark.parametrize("flip", [False, True])
def test_matches_pil_exactly(out_hw, flip):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 70, 3), np.uint8)
    crop = (5, 3, 60, 64)
    want = _pil_resize(img, crop, out_hw, flip)
    got = native.transform_one(img, crop, out_hw, flip)
    np.testing.assert_allclose(got, want, atol=1 / 255 / 2 + 1e-6)


def test_batch_transform_threads():
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (50 + i, 60, 3), np.uint8) for i in range(6)]
    crops = np.asarray([[0, 0, 50, 60]] * 6, np.int32)
    flips = np.asarray([i % 2 for i in range(6)], bool)
    out = native.batch_transform(imgs, crops, (32, 32), flips, n_threads=3)
    assert out.shape == (6, 32, 32, 3)
    for i in range(6):
        want = _pil_resize(imgs[i], tuple(crops[i]), (32, 32), flips[i])
        np.testing.assert_allclose(out[i], want, atol=1 / 255 / 2 + 1e-6)


def test_batch_transform_normalize():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (40, 40, 3), np.uint8)]
    crops = np.asarray([[0, 0, 40, 40]], np.int32)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    out = native.batch_transform(
        imgs, crops, (40, 40), np.asarray([False]), mean=mean, std=std
    )
    want = (imgs[0].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out[0], want, atol=1e-5)
