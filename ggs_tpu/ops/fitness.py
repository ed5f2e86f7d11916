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

import jax
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


def weff_denom(weight_mask, boost_only, boost_beta, H, W):
    """(effective weight plane [H, W] or None, scalar denominator) such
    that fitness == sum_px(w_eff * sum_ch dif^2) / denom for every scoring
    mode of fitness_from_images — the single-device analogue of
    sharded_weff_denom, used by the fused on-chip loss+grad kernel
    (ops/render_grad.py) so the modes cannot drift from this module."""
    hw3 = jnp.float32(H * W * 3)
    if weight_mask is None:
        return None, hw3
    w = weight_mask.astype(jnp.float32)
    if boost_only:
        w_eff = 1.0 + boost_beta * jnp.clip(w, 0.0, 1.0)
        return w_eff, (jnp.mean(w_eff) + 1e-12) * hw3
    return w, jnp.sum(w) + 1e-12


def sharded_weff_denom(w_rows, boost_only, boost_beta, H, W, tile_axis):
    """Per-device (w_eff rows, scalar denominator) for the tile-sharded
    fitness/loss paths (canvas rows sharded over `tile_axis`).

    One home for the three scoring-mode reductions of modules/
    fitness.py:18-31 so the fused-sharded fitness (ops/objective.py) and
    the tile-sharded differentiable loss (models/gradient.py) cannot
    drift: returns w_eff over this device's rows and the GLOBAL
    denominator (psum'd over the tile axis where mask-dependent). Callers
    divide their psum'd sum(dif^2 * w_eff) partials by it.
    """
    hw3 = jnp.float32(H * W * 3)
    if w_rows is None:
        return None, hw3
    if boost_only:
        w_eff = 1.0 + boost_beta * jnp.clip(w_rows.astype(jnp.float32), 0.0, 1.0)
        mean_w = jax.lax.psum(jnp.sum(w_eff), tile_axis) / jnp.float32(H * W)
        return w_eff, (mean_w + 1e-12) * hw3
    w_eff = w_rows.astype(jnp.float32)
    return w_eff, jax.lax.psum(jnp.sum(w_eff), tile_axis) + 1e-12
