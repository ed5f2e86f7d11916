"""Genome codec: axes-angle <-> Cholesky <-> screen-space precision form.

Two flat [..., N, 9] float32 encodings of a splat set (SURVEY.md §2.1):

* axes-angle genome (what the optimizers evolve):
  cols [x, y, a_log, b_log, theta, r, g, b, alpha]
  with x,y in [0,1]; a_log/b_log = log sigma in pixels; theta radians;
  colors/alpha on a 0..255 scale (reference: modules/population.py:20-46).

* renderer genome: same layout, but cols 2..4 hold the Cholesky factor of
  the covariance (log l11, log l22, l21) (reference: modules/encode.py:5-24).

`preprocess` expands the renderer genome into screen-space quantities the
rasterizers consume: center px, precision-matrix entries, unit colors, and
k-sigma integer AABBs — numerically matching modules/render.py:9-47
including the 1e-6 clamp and the conservative |l21|+|l22| y-extent bound.

Everything here is pure jnp, differentiable, and vmap/jit friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Genome column indices.
X, Y, ALOG, BLOG, THETA, R, G, B, ALPHA = range(9)
GENE_DIM = 9

_EPS_CHOL = 1e-12
_EPS_EXP = 1e-6


def wrap_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi] (reference: modules/utils.py:11-12)."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def axes_angle_to_cholesky(a_log, b_log, theta):
    """(log sx, log sy, theta) -> (log l11, log l22, l21).

    Builds the covariance from the rotated axes and factors it
    (reference: modules/encode.py:5-24).
    """
    sigma_x = jnp.exp(a_log)
    sigma_y = jnp.exp(b_log)
    c = jnp.cos(theta)
    s = jnp.sin(theta)

    sxx = (sigma_x**2) * (c**2) + (sigma_y**2) * (s**2)
    sxy = (sigma_x**2 - sigma_y**2) * s * c
    syy = (sigma_x**2) * (s**2) + (sigma_y**2) * (c**2)

    l11 = jnp.sqrt(jnp.maximum(sxx, _EPS_CHOL))
    l21 = sxy / l11
    l22 = jnp.sqrt(jnp.maximum(syy - l21 * l21, _EPS_CHOL))
    return jnp.log(l11), jnp.log(l22), l21


def genome_to_renderer(genome: jnp.ndarray) -> jnp.ndarray:
    """Axes-angle genome [..., N, 9] -> renderer genome [..., N, 9].

    Converts cols 2..4 to the Cholesky parameterization and clamps
    colors/alpha to [0, 255] (reference: modules/encode.py:28-79; the
    reference's batched variant only reshapes, encode.py:63-79 — here
    broadcasting handles any leading dims).
    """
    a_log_eff, b_log_eff, c_raw = axes_angle_to_cholesky(
        genome[..., ALOG], genome[..., BLOG], genome[..., THETA]
    )
    out = jnp.concatenate(
        [
            genome[..., X : Y + 1],
            a_log_eff[..., None],
            b_log_eff[..., None],
            c_raw[..., None],
            jnp.clip(genome[..., R : ALPHA + 1], 0.0, 255.0),
        ],
        axis=-1,
    )
    return out


class SplatScreen(NamedTuple):
    """Screen-space splat parameters (all [..., N])."""

    cx: jnp.ndarray
    cy: jnp.ndarray
    sxx: jnp.ndarray  # precision-matrix entries (Sigma^-1)
    sxy: jnp.ndarray
    syy: jnp.ndarray
    rc: jnp.ndarray  # colors in [0, 1]
    gc: jnp.ndarray
    bc: jnp.ndarray
    a: jnp.ndarray  # opacity in [0, 1]
    x0: jnp.ndarray  # integer AABB (int32, inclusive)
    x1: jnp.ndarray
    y0: jnp.ndarray
    y1: jnp.ndarray


def preprocess(g9: jnp.ndarray, H: int, W: int, k_sigma: float) -> SplatScreen:
    """Renderer genome [..., N, 9] -> screen-space params.

    Matches modules/render.py:9-47: xy clamped then scaled by (W-1, H-1);
    l11/l22 = exp(col).clamp_min(1e-6); k-sigma AABB half-extents
    hx = max(k|l11|, 1), hy = max(k(|l21|+|l22|), 1) (conservative bound);
    precision Sigma^-1 = L^-T L^-1; colors/alpha clamped then /255.
    """
    maxx = float(W - 1)
    maxy = float(H - 1)
    cx = jnp.clip(g9[..., X], 0.0, 1.0) * maxx
    cy = jnp.clip(g9[..., Y], 0.0, 1.0) * maxy

    l11 = jnp.maximum(jnp.exp(g9[..., ALOG]), _EPS_EXP)
    l22 = jnp.maximum(jnp.exp(g9[..., BLOG]), _EPS_EXP)
    l21 = g9[..., THETA]  # c_raw in renderer encoding

    hx = jnp.maximum(k_sigma * jnp.abs(l11), 1.0)
    hy = jnp.maximum(k_sigma * (jnp.abs(l21) + jnp.abs(l22)), 1.0)

    x0 = jnp.floor(jnp.clip(cx - hx, 0.0, maxx)).astype(jnp.int32)
    x1 = jnp.ceil(jnp.clip(cx + hx, 0.0, maxx)).astype(jnp.int32)
    y0 = jnp.floor(jnp.clip(cy - hy, 0.0, maxy)).astype(jnp.int32)
    y1 = jnp.ceil(jnp.clip(cy + hy, 0.0, maxy)).astype(jnp.int32)

    inv11 = 1.0 / l11
    inv22 = 1.0 / l22
    inv21 = -l21 * (inv11 * inv22)
    sxx = inv11 * inv11 + inv21 * inv21
    sxy = inv21 * inv22
    syy = inv22 * inv22

    rc = jnp.clip(g9[..., R], 0.0, 255.0) / 255.0
    gc = jnp.clip(g9[..., G], 0.0, 255.0) / 255.0
    bc = jnp.clip(g9[..., B], 0.0, 255.0) / 255.0
    a = jnp.clip(g9[..., ALPHA], 0.0, 255.0) / 255.0

    return SplatScreen(cx, cy, sxx, sxy, syy, rc, gc, bc, a, x0, x1, y0, y1)


def tighten_boxes_exact(p: SplatScreen, k_sigma: float) -> SplatScreen:
    """Deterministic tight k-sigma AABB: precision="exact-tight".

    The reference's conservative hy = k(|l21|+|l22|) (modules/render.py:25)
    is up to √2 taller than the ellipse's true y-extent k√(l21²+l22²).
    This replaces both half-extents with the exact k-sigma ellipse bbox,
    recovered from the precision entries (cov = Σ⁻¹ inverse: cov_xx =
    syy/det, cov_yy = sxx/det) — NO ε term, NO alpha dependence, so the
    truncation stays a pure k-sigma box (the same truncation CLASS the
    reference accepts), just not over-padded. The tight box INTERSECTS
    the preprocess box, so canvas clipping and the row-slab integer
    y-shift (render_pallas.fitness_pallas_partial) are inherited exactly
    (floor(x − n) = floor(x) − n for integer n).

    This is the single home of the expression: the Pallas kernels and the
    tight-box oracle (oracle.render_xla(box="tight")) both call it, which
    is what makes precision="exact-tight" bit-exact vs its oracle.
    """
    det = p.sxx * p.syy - p.sxy * p.sxy
    hx = jnp.maximum(k_sigma * jnp.sqrt(jnp.maximum(p.syy / det, 0.0)), 1.0)
    hy = jnp.maximum(k_sigma * jnp.sqrt(jnp.maximum(p.sxx / det, 0.0)), 1.0)
    x0 = jnp.maximum(p.x0, jnp.floor(p.cx - hx).astype(jnp.int32))
    x1 = jnp.minimum(p.x1, jnp.ceil(p.cx + hx).astype(jnp.int32))
    y0 = jnp.maximum(p.y0, jnp.floor(p.cy - hy).astype(jnp.int32))
    y1 = jnp.minimum(p.y1, jnp.ceil(p.cy + hy).astype(jnp.int32))
    return p._replace(x0=x0, x1=x1, y0=y0, y1=y1)


def clamp_genome(
    genome: jnp.ndarray, H: int, W: int, min_scale: float, max_scale: float
) -> jnp.ndarray:
    """Clamp an axes-angle genome to its domain (reference: modules/utils.py:36-45).

    xy -> [0,1]; log-scales -> [log min_scale, log(max_scale*max(H,W))];
    theta wrapped; colors/alpha -> [0,255].
    """
    max_side = float(max(H, W))
    lo = jnp.log(jnp.float32(min_scale))
    hi = jnp.log(jnp.float32(max_scale * max_side))
    return jnp.concatenate(
        [
            jnp.clip(genome[..., X : Y + 1], 0.0, 1.0),
            jnp.clip(genome[..., ALOG : BLOG + 1], lo, hi),
            wrap_angle(genome[..., THETA])[..., None],
            jnp.clip(genome[..., R : ALPHA + 1], 0.0, 255.0),
        ],
        axis=-1,
    )


def scale_genome_pixels_anisotropic(genome: jnp.ndarray, sH: float, sW: float) -> jnp.ndarray:
    """Rescale pixel-space log-scales for a resolution change.

    Adds log sW to a_log and log sH to b_log — exact for axis-aligned splats
    only; rotated splats are approximated, a quirk the reference accepts
    (modules/resize.py:16-20, SURVEY.md §7).
    """
    import numpy as np

    return genome.at[..., ALOG].add(float(np.log(sW))).at[..., BLOG].add(float(np.log(sH)))


def choose_work_size(Ht: int, Wt: int, max_side: int = 128) -> tuple[int, int]:
    """Scale so the longer side equals max_side exactly — up- or down-scales,
    like the reference (modules/resize.py:6-13)."""
    if Ht >= Wt:
        Hf = max_side
        Wf = max(1, int(round(Wt * Hf / Ht)))
    else:
        Wf = max_side
        Hf = max(1, int(round(Ht * Wf / Wt)))
    return Hf, Wf
