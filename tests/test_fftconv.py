"""Fused Pallas FFT-conv must match the unfused split-complex chain.

The kernel (ops/fftconv.py) computes the camera's whole circular conv
(reference ``Face-DeId/Camera/Utils.py:7-12`` conv2D) in one VMEM-
resident Pallas program; these tests check it in interpret mode against
``optics.fourier.fft_conv2d_circular`` (itself golden-tested vs the
torch reference), plus the custom-VJP backward.  The on-chip compile +
timing proof lives in ``scripts/bench_fftconv.py`` / PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.ops.dft import fft2_real
from ppvision_tpu.ops.fftconv import (
    fft_conv2d_circular_fused,
    fft_conv2d_circular_pallas,
    fused_fftconv_eligible,
)
from ppvision_tpu.optics.fourier import fft_conv2d_circular


@pytest.mark.parametrize("b,h,w,c", [(4, 16, 16, 3), (2, 32, 16, 8), (3, 8, 24, 4)])
def test_fused_matches_unfused(b, h, w, c):
    kx, kk = jax.random.split(jax.random.key(0))
    img = jax.random.normal(kx, (b, h, w, c), jnp.float32)
    ker = jax.random.normal(kk, (h, w, c), jnp.float32)
    kr, ki = fft2_real(ker, axes=(0, 1))
    got = fft_conv2d_circular_pallas(img, kr, ki, interpret=True)
    want = fft_conv2d_circular(img, ker)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_block_b_covers_ragged_batch():
    # block_b must divide B; the helper walks it down (7 -> 1 here).
    img = jax.random.normal(jax.random.key(1), (7, 8, 16, 2), jnp.float32)
    ker = jax.random.normal(jax.random.key(2), (8, 16, 2), jnp.float32)
    kr, ki = fft2_real(ker, axes=(0, 1))
    got = fft_conv2d_circular_pallas(img, kr, ki, interpret=True)
    want = fft_conv2d_circular(img, ker)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_custom_vjp_matches_unfused_grads(monkeypatch):
    # Route the fused fwd through interpret mode (no TPU in CI).
    import ppvision_tpu.ops.fftconv as m

    orig = m.fft_conv2d_circular_pallas
    monkeypatch.setattr(
        m, "fft_conv2d_circular_pallas",
        lambda img, kr, ki, **kw: orig(img, kr, ki, interpret=True),
    )
    kx, kk = jax.random.split(jax.random.key(3))
    img = jax.random.normal(kx, (2, 16, 16, 3), jnp.float32)
    ker = jax.random.normal(kk, (16, 16, 3), jnp.float32)

    def loss_fused(i, k):
        return jnp.sum(jnp.sin(fft_conv2d_circular_fused(i, k)))

    def loss_ref(i, k):
        return jnp.sum(jnp.sin(fft_conv2d_circular(i, k)))

    gi, gk = jax.grad(loss_fused, argnums=(0, 1))(img, ker)
    ri, rk = jax.grad(loss_ref, argnums=(0, 1))(img, ker)
    # Grad scale here is ~50; 5e-4 abs ~= 1e-5 rel (measured max 1.2e-4).
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=5e-4)


def test_eligibility_gate(monkeypatch):
    # Off by default (the kernel's ~4 min Mosaic compile is opt-in).
    assert not fused_fftconv_eligible((8, 128, 128, 3), 3)
    monkeypatch.setenv("PPVISION_FUSED_FFTCONV", "1")
    # The harness runs an 8-virtual-device CPU mesh; the Pallas call is
    # not auto-partitioned, so multi-device topologies must degrade to
    # the unfused chain even with the flag on.
    assert len(jax.devices()) == 8
    assert not fused_fftconv_eligible((8, 128, 128, 3), 3)
    # Pin a single-device view for the shape-gate assertions below.
    monkeypatch.setattr(jax, "devices", lambda *a: jax.local_devices()[:1])
    # Camera decode shape: eligible.
    assert fused_fftconv_eligible((8, 128, 128, 3), 3)
    # Batched kernels / wrong ranks: not.
    assert not fused_fftconv_eligible((8, 128, 128, 3), 4)
    assert not fused_fftconv_eligible((128, 128, 3), 3)
    # Lane-misaligned W*C: not.
    assert not fused_fftconv_eligible((8, 100, 100, 3), 3)


def test_flag_routes_circular_conv(monkeypatch):
    """PPVISION_FUSED_FFTCONV=1 must change the executed path of
    optics.fourier.fft_conv2d_circular on the TPU backend."""
    import jax

    import ppvision_tpu.ops.fftconv as m
    from ppvision_tpu.optics import fourier

    calls = []
    orig = m.fft_conv2d_circular_pallas

    def spy(img, kr, ki, **kw):
        calls.append(img.shape)
        return orig(img, kr, ki, interpret=True)

    monkeypatch.setattr(m, "fft_conv2d_circular_pallas", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # Single-device view: the eligibility gate refuses multi-device
    # topologies (the 8-virtual-device test mesh included).
    monkeypatch.setattr(jax, "devices", lambda *a: jax.local_devices()[:1])
    img = jax.random.normal(jax.random.key(0), (2, 16, 16, 8), jnp.float32)
    ker = jax.random.normal(jax.random.key(1), (16, 16, 8), jnp.float32)

    want = fourier.fft_conv2d_circular(img, ker)
    assert not calls  # default off
    monkeypatch.setenv("PPVISION_FUSED_FFTCONV", "1")
    got = fourier.fft_conv2d_circular(img, ker)
    assert calls == [(2, 16, 16, 8)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
