"""Pallas two-moment InstanceNorm stats kernel (ops/instats.py) —
parked infrastructure (measured slower than XLA's reduce on v5e,
PERF.md round-5b): interpret-mode equivalence + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np

from ppvision_tpu.ops.instats import (
    _moments_ref,
    instance_moments,
    instance_moments_eligible,
)


def test_interpret_matches_jnp():
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 128), jnp.bfloat16)
    m_p, m2_p = instance_moments(x, interpret=True)
    m_r, m2_r = _moments_ref(x)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2_p), np.asarray(m2_r), atol=1e-5)


def test_grad_replays_jnp_form():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 128), jnp.float32)

    def loss_p(x):
        m, m2 = instance_moments(x, interpret=True)
        return jnp.sum(m * m) + jnp.sum(m2)

    def loss_r(x):
        m, m2 = _moments_ref(x)
        return jnp.sum(m * m) + jnp.sum(m2)

    gp = jax.grad(loss_p)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-5,
                               atol=1e-6)


def test_default_off():
    x = jnp.zeros((128, 64, 64, 256), jnp.bfloat16)
    assert not instance_moments_eligible(x)
