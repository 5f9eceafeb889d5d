"""Builders for the GAN trainer's pluggable auxiliary losses.

The reference Solver constructs LPIPS and a RAFT flow loss at init
(solver.py:32-33) and mixes them into the generator steps
(solver.py:161-184).  These builders produce the ``lpips_fn`` /
``flow_fn`` callables that ``train.gan.make_train_step`` accepts, with
parameters converted from reference checkpoints when available and
fresh inits otherwise.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["build_lpips_fn", "build_flow_fn"]


def build_lpips_fn(
    img_size: int,
    params: Any | None = None,
    key: jax.Array | None = None,
    dtype: Any = None,
) -> tuple[Callable, Any]:
    """LPIPS distance closure + its params (reference solver.py:32, 176)."""
    from ..metrics.lpips import LPIPS

    model = LPIPS(dtype=dtype)
    if params is None:
        if key is None:
            key = jax.random.key(0)
        x0 = jnp.zeros((1, img_size, img_size, 3))
        params = model.init(key, x0, x0)["params"]

    def lpips_fn(x, y):
        return model.apply({"params": params}, x, y)

    return lpips_fn, params


def build_flow_fn(
    params: Any | None = None,
    key: jax.Array | None = None,
    iters: int = 20,
    image_size: int = 256,
    corr_levels: int = 4,
    corr_radius: int = 4,
) -> tuple[Callable, Any]:
    """RAFT temporal-consistency loss closure + params (reference
    solver.py:33, loss_RAFT with iters=20)."""
    from ..models.raft import RAFT, raft_flow_loss

    model = RAFT(iters=iters, corr_levels=corr_levels, corr_radius=corr_radius)
    if params is None:
        if key is None:
            key = jax.random.key(0)
        x0 = jnp.zeros((1, image_size, image_size, 3))
        params = model.init(key, x0, x0, iters=1)["params"]

    def flow_fn(frames1, frames2):
        return raft_flow_loss(model, params, frames1, frames2, iters=iters)

    return flow_fn, params
