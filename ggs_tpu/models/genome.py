"""Population initialization and annealing schedules.

Initialization distributions match modules/population.py:6-46: xy uniform
in [0,1]; per-axis log-scales sampled Beta-shaped in *linear* sigma
(Beta(m*c, (1-m)*c), m = 0.4 for a / 0.6 for b, c = 8) mapped to
[min_scale, max_scale*max(H,W)] then logged; theta uniform (-pi, pi];
colors U(0, 256) and alpha U(180, 256), both clamped to [0, 255].

The population is a single [B, N, 9] array keyed by jax.random — the
reference's list-of-tensors + torch RNG (population.py:58, SURVEY.md §7)
is a host-loop anti-pattern on TPU.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def sample_log_scales_beta_linear(
    key: jax.Array,
    shape: tuple,
    s_lo: float,
    s_hi: float,
    m: float = 0.5,
    concentration: float = 8.0,
) -> jnp.ndarray:
    """Beta-shaped linear-sigma sampling, then log (modules/population.py:6-16)."""
    eps = 1e-6
    alpha = m * max(concentration, eps) + eps
    beta = (1.0 - m) * max(concentration, eps) + eps
    u = jax.random.beta(key, alpha, beta, shape=shape, dtype=jnp.float32)
    sigma = s_lo + u * (s_hi - s_lo)
    return jnp.log(sigma)


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_splats", "H", "W", "min_scale", "max_scale"),
)
def new_population(
    key: jax.Array,
    batch_size: int,
    n_splats: int,
    H: int,
    W: int,
    min_scale: float = 3.0,
    max_scale: float = 0.1,
) -> jnp.ndarray:
    """Fresh axes-angle population [B, N, 9] (modules/population.py:20-46)."""
    B, N = batch_size, n_splats
    max_side = float(max(H, W))
    s_lo = float(min_scale)
    s_hi = float(max_scale * max_side)

    k_xy, k_a, k_b, k_t, k_rgb, k_al = jax.random.split(key, 6)
    xy = jax.random.uniform(k_xy, (B, N, 2), dtype=jnp.float32)
    a = sample_log_scales_beta_linear(k_a, (B, N, 1), s_lo, s_hi, m=0.4)
    b = sample_log_scales_beta_linear(k_b, (B, N, 1), s_lo, s_hi, m=0.6)
    theta = jax.random.uniform(
        k_t, (B, N, 1), minval=-math.pi, maxval=math.pi, dtype=jnp.float32
    )
    rgb = jax.random.uniform(k_rgb, (B, N, 3), minval=0.0, maxval=256.0, dtype=jnp.float32)
    alpha = jax.random.uniform(k_al, (B, N, 1), minval=180.0, maxval=256.0, dtype=jnp.float32)

    G = jnp.concatenate([xy, a, b, theta, rgb, alpha], axis=-1)
    G = G.at[..., 0:2].set(jnp.clip(G[..., 0:2], 0.0, 1.0))
    G = G.at[..., 5:9].set(jnp.clip(G[..., 5:9], 0.0, 255.0))
    return G


def new_individual(key, n_splats, H, W, min_scale=3.0, max_scale=0.1):
    """Single individual [N, 9] (modules/population.py:49-51)."""
    return new_population(key, 1, n_splats, H, W, min_scale, max_scale)[0]


def anneal_factor(gen, total: int, kind: str):
    """Mutation-sigma decay in [0, 1] (modules/utils.py:15-28).

    `gen` may be a traced integer; `total`/`kind` are static.
    """
    g = jnp.clip(gen, 0, total).astype(jnp.float32)
    p = g / float(max(1, total))
    if kind == "cosine":
        raw = 0.5 * (1.0 + jnp.cos(jnp.pi * p))
    elif kind == "exp":
        decay = 0.2 ** (1.0 / max(1, total))
        raw = decay**g
    else:  # "linear" and unknown kinds fall back to linear, like the reference
        raw = 1.0 - p
    return jnp.maximum(raw, 0.0)


def build_mut_sigma(gen, total: int, kind: str, sig_max: dict, sig_min: dict) -> dict:
    """Lerp min<->max per gene group by the anneal factor (modules/utils.py:31-33)."""
    f = anneal_factor(gen, total, kind)
    return {k: sig_min[k] + f * (sig_max[k] - sig_min[k]) for k in sig_max}


def temp_schedule(kind: str, T0: float, i, total: int):
    """SA temperature schedules (modules/annealing.py:29-44); `i` may be traced."""
    i = jnp.asarray(i, dtype=jnp.float32)
    p = i / float(max(1, total))
    if kind == "linear":
        return jnp.maximum(1e-12, T0 * (1.0 - p))
    if kind == "cosine":
        return jnp.maximum(1e-12, T0 * 0.5 * (1.0 + jnp.cos(jnp.pi * p)))
    if kind == "log":
        return jnp.maximum(1e-12, T0 / (1.0 + jnp.log(1.0 + 9.0 * i)))
    if kind == "cauchy":
        return jnp.maximum(1e-12, T0 / (1.0 + i))
    # "exp" and unknown kinds fall back to exponential, like the reference
    r = 0.01 ** (1.0 / max(1, total))
    return T0 * (r**i)
