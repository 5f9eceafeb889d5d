"""Shape/dtype guards for public API edges.

The reference validates almost nothing (SURVEY §5.2); a framework
should fail with a clear message instead of a deep XLA shape error.
All checks run at TRACE time (static shapes/dtypes), so they cost
nothing inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["check_image_batch", "check_labels", "check_styles"]


def check_image_batch(x, name: str, channels: int = 3, size: int | None = None):
    """NHWC float image batch; optionally a fixed square size."""
    if x.ndim != 4:
        raise ValueError(
            f"{name}: expected NHWC batch (4 dims), got shape {tuple(x.shape)}"
        )
    if x.shape[-1] != channels:
        raise ValueError(
            f"{name}: expected {channels} channels last (NHWC), got shape "
            f"{tuple(x.shape)} — is this NCHW? transpose(0, 2, 3, 1) first"
        )
    if size is not None and (x.shape[1] != size or x.shape[2] != size):
        raise ValueError(
            f"{name}: expected {size}x{size} images, got {tuple(x.shape)}"
        )
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise ValueError(
            f"{name}: expected float dtype in [0, 1], got {x.dtype} — "
            "divide uint8 images by 255 first"
        )


def check_labels(y, name: str, batch: int | None = None):
    """1-D integer domain labels."""
    if y.ndim != 1:
        raise ValueError(f"{name}: expected 1-D labels, got shape {tuple(y.shape)}")
    if not jnp.issubdtype(y.dtype, jnp.integer):
        raise ValueError(f"{name}: expected integer labels, got {y.dtype}")
    if batch is not None and y.shape[0] != batch:
        raise ValueError(
            f"{name}: batch mismatch — labels {y.shape[0]} vs images {batch}"
        )


def check_styles(s, name: str, style_dim: int | None = None):
    if s.ndim != 2:
        raise ValueError(f"{name}: expected (B, style_dim), got {tuple(s.shape)}")
    if style_dim is not None and s.shape[-1] != style_dim:
        raise ValueError(
            f"{name}: style_dim mismatch — got {s.shape[-1]}, expected {style_dim}"
        )
