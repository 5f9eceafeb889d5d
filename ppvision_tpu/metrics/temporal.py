"""RAFT temporal-consistency evaluation for de-id video.

The reference only uses RAFT as a training loss (core/utils.py:437-462,
weight 10 in solver.py:162-184); for BASELINE config 5 (video de-id) we
also expose it as an eval: how closely the anonymized sequence's motion
field tracks the source sequence's.

``flow_consistency`` = mean end-point error between the optical flow of
consecutive source frames and the flow of the corresponding anonymized
frames — 0 means the anonymization is perfectly temporally consistent
(it moves exactly like the source).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["flow_consistency", "make_flow_consistency_fn"]


def make_flow_consistency_fn(raft, params: Any, iters: int = 12):
    """Build a jittable consistency scorer from a RAFT model + params."""

    def score(src_frames: jnp.ndarray, fake_frames: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) [0,1] source + anonymized sequences -> scalar.

        RAFT expects [0,255]; both sequences' consecutive-pair flows are
        computed in one batched call (pairs ride the batch axis).
        """
        a1, a2 = src_frames[:-1] * 255.0, src_frames[1:] * 255.0
        b1, b2 = fake_frames[:-1] * 255.0, fake_frames[1:] * 255.0
        f1 = jnp.concatenate([a1, b1], axis=0)
        f2 = jnp.concatenate([a2, b2], axis=0)
        flow = raft.apply({"params": params}, f1, f2, iters=iters)
        n = a1.shape[0]
        flow_src, flow_fake = flow[:n], flow[n:]
        epe = jnp.sqrt(jnp.sum((flow_src - flow_fake) ** 2, axis=-1) + 1e-12)
        return jnp.mean(epe)

    return score


def flow_consistency(
    raft, params: Any, src_frames: jnp.ndarray, fake_frames: jnp.ndarray,
    iters: int = 12,
) -> float:
    """One-shot convenience wrapper around ``make_flow_consistency_fn``."""
    fn = jax.jit(make_flow_consistency_fn(raft, params, iters=iters))
    return float(fn(src_frames, fake_frames))
