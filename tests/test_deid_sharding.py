"""Data-parallel serving: the full de-id eval path (camera -> FAN ->
scan-over-styles generator) must produce identical outputs whether the
source batch lives on 1 device or is sharded over 8.

The only cross-sample coupling in the path is the generator encoder's
global-mean centering of the high-pass caches (``x - x.mean()``,
reference model.py:169-183 semantics) — under GSPMD that is a global
reduce, so sharding must not change results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid, deid_multi_style
from ppvision_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_deid_multi_style_shard_invariant():
    # float32 compute: the path is EXACTLY shard-invariant in f32
    # (verified diff 0.0); under bfloat16 the per-device reduce
    # reassociation is amplified through the random-init IN/AdaIN
    # chains, which would need a loose statistical bound instead.
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=64, style_dim=16, latent_dim=8, max_conv_dim=64,
                          compute_dtype="float32"),
        camera=CameraConfig(n=32),
    )
    bundle = build_deid(jax.random.key(0), cfg)
    b, r = 8, 2
    xs = jax.random.uniform(jax.random.key(1), (b, 64, 64, 3))
    xr = jax.random.uniform(jax.random.key(2), (r, 64, 64, 3))
    yr = jnp.zeros((r,), jnp.int32)

    fn = jax.jit(lambda p, a, c, d: deid_multi_style(bundle, p, a, c, d))
    want = np.asarray(fn(bundle.params, xs, xr, yr))

    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest should provision 8 virtual devices"
    xs_sh = jax.device_put(xs, NamedSharding(mesh, P("data")))
    xr_rep = jax.device_put(xr, NamedSharding(mesh, P()))
    got = np.asarray(fn(bundle.params, xs_sh, xr_rep, yr))

    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)
