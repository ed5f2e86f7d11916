"""Fitness: (importance-masked) MSE between rendered candidates and a target.

Reproduces the three scoring modes of modules/fitness.py:8-31 — plain mean
MSE, normalized weighted MSE (default), and boost-only — with the same
reductions (the weighted mode sums dif^2 over all 3 channels but counts
each pixel's weight once, matching the [1,H,W,1] broadcast in the
reference). Unlike the reference, which syncs a List[float] to host every
call (fitness.py:42), everything here stays on device: fitness values feed
selection/acceptance inside the same jitted step.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def fitness_from_images(
    imgs: jnp.ndarray,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray] = None,
    boost_only: bool = False,
    boost_beta: float = 1.0,
) -> jnp.ndarray:
    """imgs [B, H, W, 3], target [H, W, 3], weight_mask [H, W] -> fitness [B].

    Lower is better (MSE-like energies, minimized by all optimizers).
    """
    dif2 = (imgs - target[None]) ** 2  # [B, H, W, 3]

    if weight_mask is None:
        return jnp.mean(dif2, axis=(1, 2, 3))

    w = weight_mask[None, :, :, None]  # [1, H, W, 1]

    if boost_only:
        # mean(dif2 * (1 + beta*w)) / (mean(1 + beta*w) + eps)
        # (modules/fitness.py:23-27)
        w_boost = 1.0 + boost_beta * jnp.clip(w, 0.0, 1.0)
        num = jnp.mean(dif2 * w_boost, axis=(1, 2, 3))
        den = jnp.mean(w_boost, axis=(1, 2, 3)) + 1e-12
        return num / den

    # sum(dif2 * w) / (sum(w) + eps): channel-summed numerator, per-pixel
    # denominator (modules/fitness.py:29-31).
    num = jnp.sum(dif2 * w, axis=(1, 2, 3))
    den = jnp.sum(w, axis=(1, 2, 3)) + 1e-12
    return num / den
