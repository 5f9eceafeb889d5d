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


needs_jpeg = pytest.mark.skipif(
    not (native.available() and native.has_jpeg()),
    reason="native lib built without libjpeg",
)


def _jpeg_bytes(img, quality=90):
    import io

    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality)
    return b.getvalue()


@needs_jpeg
def test_decode_jpeg_matches_pil_exactly():
    """Same libjpeg decoder PIL links -> bit-identical pixels."""
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (93, 71, 3), np.uint8)
    data = _jpeg_bytes(img, quality=85)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert native.jpeg_dims(data) == want.shape[:2]
    got = native.decode_jpeg(data)
    np.testing.assert_array_equal(got, want)


@needs_jpeg
def test_decode_jpeg_grayscale_converts_to_rgb():
    import io

    from PIL import Image

    rng = np.random.default_rng(4)
    gray = rng.integers(0, 256, (40, 52), np.uint8)
    b = io.BytesIO()
    Image.fromarray(gray, "L").save(b, "JPEG", quality=92)
    data = b.getvalue()
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native.decode_jpeg(data), want)


@needs_jpeg
def test_batch_decode_transform_matches_two_step():
    """Fused bytes->batch == decode-then-batch_transform, plus corrupt
    slots flagged and zero-filled."""
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (64 + 7 * i, 80, 3), np.uint8) for i in range(5)]
    datas = [_jpeg_bytes(im) for im in imgs]
    decoded = [native.decode_jpeg(d) for d in datas]
    crops = np.asarray(
        [[0, 0, 64, 80], [3, 5, 50, 60], [-1, -1, 48, 48], [0, 0, 0, 0], [10, 0, 40, 70]],
        np.int32,
    )
    flips = np.asarray([0, 1, 0, 1, 0], bool)
    out, ok = native.batch_decode_transform(datas, crops, (32, 32), flips, n_threads=3)
    assert ok.all()
    # mirror the centered / full-image defaults for the two-step path
    eff = []
    for i, c in enumerate(crops):
        h, w = decoded[i].shape[:2]
        cy, cx, ch, cw = c
        ch = h if ch <= 0 or ch > h else ch
        cw = w if cw <= 0 or cw > w else cw
        cy = (h - ch) // 2 if cy < 0 else min(cy, h - ch)
        cx = (w - cw) // 2 if cx < 0 else min(cx, w - cw)
        eff.append([cy, cx, ch, cw])
    want = native.batch_transform(decoded, np.asarray(eff, np.int32), (32, 32), flips)
    np.testing.assert_array_equal(out, want)

    out2, ok2 = native.batch_decode_transform(
        [datas[0], b"\xff\xd8broken"], np.asarray([[-1, -1, 0, 0]] * 2, np.int32),
        (16, 16), np.zeros(2, bool),
    )
    assert ok2[0] and not ok2[1]
    assert np.abs(out2[1]).max() == 0.0


@needs_jpeg
def test_batch_decode_thread_pool_determinism_under_contention():
    """The host pipeline's parallelism claim, stress-tested.

    All libjpeg state in the native pool is per-call stack-local (one
    ``jpeg_decompress_struct`` + ``JerrJmp`` per ``decode_jpeg_rgb``
    invocation, native/transform.cpp) — there is no shared error
    handler — so the batch result must be bit-identical at every thread
    count, including when corrupt streams drive the ``longjmp`` error
    path while other threads are mid-decode.  Oversubscribing threads
    (16 on this 1-core VM) forces preemption inside decode/transform,
    interleaving the error path with in-flight work.
    """
    rng = np.random.default_rng(11)
    datas, n = [], 64
    for i in range(n):
        kind = i % 5
        if kind == 3:  # corrupt: valid SOI then garbage
            datas.append(b"\xff\xd8" + bytes(rng.integers(0, 256, 40, np.uint8)))
        elif kind == 4:  # corrupt: truncated valid stream
            img = rng.integers(0, 256, (60, 44, 3), np.uint8)
            datas.append(_jpeg_bytes(img)[: 30 + int(rng.integers(0, 60))])
        else:
            h, w = 40 + int(rng.integers(0, 80)), 40 + int(rng.integers(0, 80))
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            datas.append(_jpeg_bytes(img, quality=int(rng.integers(60, 96))))
    crops = np.stack(
        [
            rng.integers(0, 5, n),
            rng.integers(0, 5, n),
            rng.integers(24, 40, n),
            rng.integers(24, 40, n),
        ],
        axis=1,
    ).astype(np.int32)
    flips = rng.random(n) < 0.5
    golden, ok_golden = native.batch_decode_transform(
        datas, crops, (32, 32), flips, n_threads=1
    )
    # truncated streams may still decode (libjpeg pads) — the corrupt-SOI
    # ones must not; either way the classification must be stable.
    assert not ok_golden[3::5].any()
    assert ok_golden[0::5].all() and ok_golden[1::5].all() and ok_golden[2::5].all()
    for n_threads in (4, 16):
        for _ in range(4):
            out, ok = native.batch_decode_transform(
                datas, crops, (32, 32), flips, n_threads=n_threads
            )
            np.testing.assert_array_equal(ok, ok_golden)
            np.testing.assert_array_equal(out, golden)
