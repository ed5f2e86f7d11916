"""Scale-space annealing: continuous coarse-to-fine without recompiles.

The discrete `--progressive` stages (docs/DESIGN.md §9) change the canvas
SHAPE per stage, so every stage recompiles the run block and switches the
fitness landscape abruptly — measured quality-negative vs flat fitting.
This module implements the continuous alternative the roadmap asked for
("anneal resolution continuously"), designed TPU-first: instead of
changing resolution (a static shape), anneal in SCALE SPACE at a fixed
canvas. Evaluating a genome "at coarse scale sigma" means

  * each splat's covariance gains sigma^2 I  — EXACT in closed form for
    Gaussians, and in the axes-angle encoding it touches only the two
    log-scale genes (the rotation is untouched because sigma^2 I commutes
    with it): s_x -> sqrt(s_x^2 + sigma^2);
  * its amplitude scales by sqrt(det Sigma / det(Sigma + sigma^2 I)) so
    the splat's *image* is exactly its Gaussian-blurred self (peak drops
    as mass spreads) — splats much smaller than sigma correctly vanish at
    coarse scale;
  * the target is blurred with the same Gaussian.

Blur(composite) != composite(blurred splats) in general ("over" is
nonlinear in alpha), but each individual splat layer blurs exactly and
the two agree as sigma -> 0, which is all a homotopy/continuation method
needs: a smoothed landscape family that converges to the true objective.

sigma enters every function as a DYNAMIC (traceable) scalar, so one
compiled run block serves the entire schedule — the "resolution-indexed
recompile story" discrete progressive needed simply disappears.

No reference analogue (the reference has neither progressive nor
annealing); the A/B against flat and discrete progressive is in
docs/DESIGN.md §9c.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import codec

# Below this sigma the blur is numerically a no-op on >=1px splats; the
# schedule snaps to exact-objective (sigma = 0) instead of limping there.
SIGMA_SNAP = 0.25


def blur_genome_axes(
    genome: jnp.ndarray, sigma, conserve_mass: bool = True
) -> jnp.ndarray:
    """Axes-angle genome [..., N, 9] -> the same genome at scale `sigma`.

    Exact per-splat Gaussian blur: covariance R diag(sx^2, sy^2) R^T
    gains sigma^2 I, i.e. sx' = sqrt(sx^2 + sigma^2) with theta unchanged.
    With conserve_mass (the image-blur semantics) alpha scales by
    sx*sy / sqrt((sx^2+s^2)(sy^2+s^2)) so integrated mass is preserved
    and the splat's rendered layer equals the Gaussian blur of the
    original layer (tests/test_anneal.py pins this against an explicit
    image-space convolution). Differentiable in both genome and sigma.
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    s2 = sigma * sigma
    vx = jnp.exp(2.0 * genome[..., codec.ALOG])  # sx^2
    vy = jnp.exp(2.0 * genome[..., codec.BLOG])
    a_log = 0.5 * jnp.log(vx + s2)
    b_log = 0.5 * jnp.log(vy + s2)
    out = (
        genome.at[..., codec.ALOG].set(a_log).at[..., codec.BLOG].set(b_log)
    )
    if conserve_mass:
        amp = jnp.sqrt((vx / (vx + s2)) * (vy / (vy + s2)))
        out = out.at[..., codec.ALPHA].mul(amp)
    return out


def gaussian_kernel(sigma, radius: int) -> jnp.ndarray:
    """Normalized 1-D Gaussian taps [2*radius+1] for a dynamic sigma.

    Static width, dynamic weights: one compiled conv serves the whole
    schedule. sigma is clamped away from 0 so the kernel degrades to a
    crisp delta rather than 0/0 (callers snap to the unblurred path below
    SIGMA_SNAP anyway)."""
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-3)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / jnp.sum(w)


def blur_image(img: jnp.ndarray, sigma, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W, C] with renormalized edges.

    Edge handling divides by the blurred all-ones canvas, so flat regions
    stay exactly flat up to the border (no darkening) and the DC level is
    preserved — the property the annealed MSE landscape needs. `radius`
    is static (pick >= ceil(3*sigma_max)); sigma is dynamic.
    """
    w = gaussian_kernel(sigma, radius)
    kh = w.reshape(1, 1, 2 * radius + 1, 1)
    kw = w.reshape(1, 1, 1, 2 * radius + 1)

    def conv2(x):  # [C, H, W] feature-map conv, same padding
        x = x[:, None]  # [C, 1, H, W]
        for k in (kh, kw):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", precision=jax.lax.Precision.HIGHEST
            )
        return x[:, 0]

    x = jnp.moveaxis(jnp.asarray(img, jnp.float32), -1, 0)
    ones = jnp.ones_like(x[:1])
    return jnp.moveaxis(conv2(x) / conv2(ones), 0, -1)


def sigma_schedule(gen: int, total_gens: int, sigma0: float, frac: float = 0.6,
                   sigma_end: float = 0.5) -> float:
    """Host-side schedule: geometric decay sigma0 -> sigma_end over the
    first `frac` of the budget, then exactly 0 (the true objective gets
    the entire remaining budget). Returns a plain float; values below
    SIGMA_SNAP snap to 0.0 so callers can branch to the unblurred path."""
    if sigma0 <= 0.0 or total_gens <= 0:
        return 0.0
    t_anneal = max(1.0, frac * total_gens)
    if gen >= t_anneal:
        return 0.0
    s = sigma0 * (sigma_end / sigma0) ** (gen / t_anneal)
    return float(s) if s > SIGMA_SNAP else 0.0


def default_radius(sigma0: float) -> int:
    """Static conv radius covering the largest sigma of the run."""
    return max(1, int(math.ceil(3.0 * sigma0)))
