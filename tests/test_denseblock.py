"""Fused Pallas DenseConvBlock equivalence (ops/denseblock.py).

Mirrors the winograd test strategy: interpret-mode equivalence against
the exact unfused op chain, flag-routing proof through models/fan.py,
and gradient parity of the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.ops.denseblock import (
    dense_block_eligible,
    dense_block_ref,
    fused_dense_block,
)


def _mk(key, b=2, h=8, w=8, f=256, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 10)
    half, quarter = f // 2, f // 4
    x = jax.random.normal(ks[0], (b, h, w, f), dtype)
    k1 = jax.random.normal(ks[1], (3, 3, f, half), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[2], (3, 3, half, quarter), jnp.float32) * 0.1
    k3 = jax.random.normal(ks[3], (3, 3, quarter, quarter), jnp.float32) * 0.1
    bns = []
    for i, c in enumerate((f, half, quarter)):
        mul = 1.0 + 0.1 * jax.random.normal(ks[4 + i], (c,), jnp.float32)
        add = 0.1 * jax.random.normal(ks[7 + i], (c,), jnp.float32)
        bns.append((mul, add))
    return x, k1, k2, k3, bns


def test_interpret_matches_unfused():
    x, k1, k2, k3, bns = _mk(jax.random.key(0))
    got = fused_dense_block(
        x, k1.astype(x.dtype), k2.astype(x.dtype), k3.astype(x.dtype),
        *bns, interpret=True,
    )
    want = dense_block_ref(
        x, k1.astype(x.dtype), k2.astype(x.dtype), k3.astype(x.dtype), *bns
    )
    assert got.shape == want.shape and got.dtype == want.dtype
    g = np.asarray(got, np.float32)
    wnt = np.asarray(want, np.float32)
    # bf16 conv with tap-order reassociation: direct-conv error scale.
    rel = np.max(np.abs(g - wnt)) / (np.max(np.abs(wnt)) + 1e-8)
    assert rel < 2e-2, rel


def test_eligibility_gates():
    import os

    x = jnp.zeros((2, 64, 64, 256), jnp.bfloat16)
    # Default OFF (measured 1% end-to-end LOSS on v5e, PERF.md round-5).
    assert not dense_block_eligible(x, 256)
    os.environ["PPVISION_FUSED_FAN"] = "1"
    try:
        on_tpu = jax.default_backend() == "tpu"
        assert dense_block_eligible(x, 256) == on_tpu
        assert not dense_block_eligible(x, 128)  # in != out
        assert not dense_block_eligible(x.astype(jnp.float32), 256)
        # Shapes measured slower fused even in micro: small maps, 128ch.
        assert not dense_block_eligible(
            jnp.zeros((2, 32, 32, 256), jnp.bfloat16), 256)
        assert not dense_block_eligible(
            jnp.zeros((2, 64, 64, 128), jnp.bfloat16), 128)
    finally:
        os.environ.pop("PPVISION_FUSED_FAN")


def test_grad_matches_unfused():
    x, k1, k2, k3, bns = _mk(jax.random.key(1), b=1, h=8, w=8, f=64)
    k1 = k1.astype(x.dtype)
    k2 = k2.astype(x.dtype)
    k3 = k3.astype(x.dtype)

    def loss_fused(x):
        return jnp.sum(
            fused_dense_block(x, k1, k2, k3, *bns, interpret=True) ** 2
        ).astype(jnp.float32)

    def loss_ref(x):
        return jnp.sum(dense_block_ref(x, k1, k2, k3, *bns) ** 2).astype(
            jnp.float32
        )

    gf = jax.grad(loss_fused)(x)
    gr = jax.grad(loss_ref)(x)
    # The custom VJP replays the unfused chain; only the cotangent
    # (from the slightly different primal) differs.
    rel = float(
        jnp.max(jnp.abs(gf.astype(jnp.float32) - gr.astype(jnp.float32)))
        / (jnp.max(jnp.abs(gr.astype(jnp.float32))) + 1e-8)
    )
    assert rel < 5e-2, rel


def test_fan_block_routes_and_matches():
    """The flag changes the executed path in models/fan.py and the two
    paths agree numerically on a real DenseConvBlock."""
    import os

    from ppvision_tpu.models.fan import DenseConvBlock

    blk = DenseConvBlock(256, 256, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 256), jnp.bfloat16)
    params = blk.init(jax.random.key(3), x)

    want = blk.apply(params, x)
    os.environ["PPVISION_FUSED_FAN"] = "1"
    try:
        got = blk.apply(params, x)
    finally:
        os.environ.pop("PPVISION_FUSED_FAN")

    if jax.default_backend() != "tpu":
        # Off-TPU the fused path is ineligible: exact same path.
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        return
    rel = np.max(
        np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    ) / (np.max(np.abs(np.asarray(want, np.float32))) + 1e-8)
    assert rel < 2e-2, rel
