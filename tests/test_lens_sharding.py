"""Shard-invariance of optics normalization (VERDICT r1 weak #8).

The captioning lens normalizes by the max over the WHOLE batch
(reference Lens.py:312). Under jit+GSPMD a reduction over a
batch-sharded array is a global reduce, so 1-device and 8-device
outputs must be identical; this pins that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppvision_tpu.optics import lens as plens
from ppvision_tpu.optics.camera import (
    CameraSpec,
    camera_apply,
    init_camera_params,
    make_camera_constants,
)


@pytest.mark.slow
def test_lens_batch_max_is_shard_invariant(tmp_path, monkeypatch):
    monkeypatch.setenv("PPVISION_CACHE", str(tmp_path))
    spec = plens.LensSpec(
        wave_res=64, patch_size=32, zernike_terms=16, height_tolerance=0.0
    )
    consts = plens.make_lens_constants(spec)
    params = plens.init_lens_params(spec)
    b = 8
    # One bright outlier image so the batch-global max really matters:
    # a per-shard max would normalize the other shards differently.
    img = np.random.default_rng(0).uniform(size=(b, 32, 32, 3)).astype(np.float32)
    img[3] *= 5.0
    img = jnp.asarray(img)

    fn = jax.jit(lambda x: plens.lens_apply(params, consts, spec, x).sensor)
    ref = np.asarray(fn(img))

    assert len(jax.devices()) >= 8
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    sharded = jax.device_put(img, NamedSharding(mesh, P("data")))
    out = np.asarray(fn(sharded))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
    assert ref.max() == pytest.approx(1.0, rel=1e-6)


def test_camera_per_image_max_is_shard_invariant():
    spec = CameraSpec(n=32, zernike_terms=16)
    consts = make_camera_constants(spec)
    params = init_camera_params(jax.random.key(0), spec)
    img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))

    fn = jax.jit(lambda x: camera_apply(params, consts, x)[0])
    ref = np.asarray(fn(img))

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    sharded = jax.device_put(img, NamedSharding(mesh, P("data")))
    out = np.asarray(fn(sharded))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
