"""Checkpoint round-trip + non-strict merge tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.utils.checkpoint import (
    StepCheckpoints,
    merge_loaded,
    restore_pytree,
    save_pytree,
)


@pytest.mark.slow
def test_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    p = str(tmp_path / "ck")
    save_pytree(p, tree)
    back = restore_pytree(p)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.ones((2, 3)))


def test_step_checkpoints(tmp_path):
    ck = StepCheckpoints(str(tmp_path))
    ck.save(10, "nets", {"x": jnp.zeros(2)})
    ck.save(20, "nets", {"x": jnp.ones(2)})
    assert ck.latest_step("nets") == 20
    latest = ck.load(20, "nets")
    np.testing.assert_array_equal(np.asarray(latest["x"]), 1.0)


def test_merge_loaded_nonstrict_and_priv_skip():
    target = {"gen": {"w": 0.0}, "fan_priv": {"w": 0.0}, "extra": {"w": 0.0}}
    loaded = {"gen": {"w": 1.0}, "fan_priv": {"w": 9.0}, "unknown": {"w": 5.0}}
    out = merge_loaded(target, loaded, skip_substrings=("priv",))
    assert out["gen"]["w"] == 1.0          # loaded
    assert out["fan_priv"]["w"] == 0.0     # skipped (priv)
    assert out["extra"]["w"] == 0.0        # missing in loaded -> kept
    assert "unknown" not in out            # extra loaded keys dropped
