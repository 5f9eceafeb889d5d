"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must run before jax is imported anywhere, so the XLA flags stick.
Multi-chip sharding tests rely on the 8 virtual devices; the driver
separately validates the real-TPU path via ``__graft_entry__``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The session sitecustomize registers the TPU tunnel backend and pins
# JAX_PLATFORMS=axon; tests always run on the virtual CPU mesh
# (override with PPVISION_TEST_PLATFORM).  The env var alone is not
# enough — jax.config must be updated after import, before first use.
_platform = os.environ.get("PPVISION_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
os.environ.setdefault("MPLBACKEND", "Agg")
# Keep the zernike disk cache inside the workspace.
os.environ.setdefault("PPVISION_CACHE", os.path.join(os.path.dirname(__file__), ".cache"))
