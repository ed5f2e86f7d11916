"""Search operators: tournament selection, uniform crossover, mutation.

Functional, `jax.random`-keyed redesigns of modules/genetic.py:8-93. The
reference mutates tensors in place with host-side `random` calls and
`.item()` syncs (genetic.py:27, 82, 88); here every operator is a pure
function over arrays so whole-population variants are one `vmap` away and
live inside the jitted generation step. Behavioral contracts preserved
(SURVEY.md §7): per-group >=1-gene-mutated guarantees, theta wrapping,
genome clamping, and the z-order swap invariant (a strictly larger-area
splat from a later z-index is swapped underneath a random earlier one).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import codec


def tournament_selection(key: jax.Array, fits: jnp.ndarray, num: int, k: int = 2) -> jnp.ndarray:
    """`num` independent k-way tournaments over fitness [P] -> winner indices [num].

    Each tournament draws k entrants uniformly with replacement and keeps
    the minimum fitness (modules/genetic.py:8-14). Ties go to the earliest
    draw, like the reference's strict `<` update.
    """
    P = fits.shape[0]
    idx = jax.random.randint(key, (num, k), 0, P)
    cand = fits[idx]  # [num, k]
    win = jnp.argmin(cand, axis=1)
    return jnp.take_along_axis(idx, win[:, None], axis=1)[:, 0]


def crossover_uniform(key: jax.Array, a: jnp.ndarray, b: jnp.ndarray, p: float = 0.5):
    """Per-splat-row uniform crossover -> two complementary children
    (modules/genetic.py:17-21). a, b: [N, 9]."""
    m = jax.random.uniform(key, (a.shape[0], 1)) < p
    return jnp.where(m, a, b), jnp.where(m, b, a)


def _ensure_one_true(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """If the mask is all-False, set one uniformly random entry True
    (modules/genetic.py:24-29)."""
    flat = mask.reshape(-1)
    idx = jax.random.randint(key, (), 0, flat.shape[0])
    onehot = jnp.arange(flat.shape[0]) == idx
    return jnp.where(flat.any(), flat, onehot).reshape(mask.shape)


def mutate_individual(
    key: jax.Array,
    ind: jnp.ndarray,
    sig: Dict[str, jnp.ndarray],
    mutpb: float,
    H: int,
    W: int,
    min_scale: float,
    max_scale: float,
) -> jnp.ndarray:
    """Mutate one axes-angle genome [N, 9] (modules/genetic.py:32-93).

    Bernoulli(mutpb) gene-group masks with >=1-True guarantees, Gaussian
    perturbations scaled by the annealed per-group sigmas, clamping, and
    the z-order swap. `sig` comes from genome.build_mut_sigma.
    """
    N = ind.shape[0]
    keys = jax.random.split(key, 14)

    m_xy = jax.random.uniform(keys[0], (N, 2)) < mutpb
    m_ab = jax.random.uniform(keys[1], (N, 2)) < mutpb
    m_t = jax.random.uniform(keys[2], (N, 1)) < mutpb
    m_rgb_flag = jax.random.uniform(keys[3], (N, 1)) < mutpb
    m_a_flag = jax.random.uniform(keys[4], (N, 1)) < mutpb

    # >=1 of the 2N rgb/alpha flags must fire (joint guarantee, genetic.py:47-53)
    m_pair = _ensure_one_true(keys[5], jnp.concatenate([m_rgb_flag, m_a_flag], axis=1))
    m_rgb_flag = m_pair[:, 0:1]
    m_a_flag = m_pair[:, 1:2]
    m_rgba = jnp.concatenate([jnp.broadcast_to(m_rgb_flag, (N, 3)), m_a_flag], axis=1)

    m_xy = _ensure_one_true(keys[6], m_xy)
    m_ab = _ensure_one_true(keys[7], m_ab)
    m_t = _ensure_one_true(keys[8], m_t)

    xy = ind[:, 0:2] + jax.random.normal(keys[9], (N, 2)) * sig["xy"] * m_xy
    sig_ab = jnp.stack([jnp.asarray(sig["alog"]), jnp.asarray(sig["blog"])])
    ab = ind[:, 2:4] + jax.random.normal(keys[10], (N, 2)) * sig_ab[None, :] * m_ab
    th = ind[:, 4:5] + jax.random.normal(keys[11], (N, 1)) * sig["theta"] * m_t
    th = codec.wrap_angle(th)
    sig_rgba = jnp.stack(
        [jnp.asarray(sig["rgb"])] * 3 + [jnp.asarray(sig["alpha"])]
    )
    rgba = ind[:, 5:9] + jax.random.normal(keys[12], (N, 4)) * sig_rgba[None, :] * m_rgba

    out = jnp.concatenate([xy, ab, th, rgba], axis=1)
    out = codec.clamp_genome(out, H, W, min_scale, max_scale)
    return _zorder_swap(keys[13], out)


def _zorder_swap(key: jax.Array, ind: jnp.ndarray) -> jnp.ndarray:
    """Move a larger later splat underneath a random earlier one
    (modules/genetic.py:80-91): pick i ~ U[0, N-2]; among j > i with
    area exp(a)exp(b) strictly greater than splat i's, swap rows with one
    chosen uniformly; no-op when no candidate exists."""
    N = ind.shape[0]
    if N < 2:
        return ind
    k_i, k_j = jax.random.split(key)
    i = jax.random.randint(k_i, (), 0, N - 1)
    size = jnp.exp(ind[:, 2]) * jnp.exp(ind[:, 3])
    cand = (jnp.arange(N) > i) & (size > size[i])
    u = jax.random.uniform(k_j, (N,))
    j = jnp.argmax(jnp.where(cand, u, -1.0))
    do = cand.any()
    row_i = ind[i]
    row_j = ind[j]
    swapped = ind.at[i].set(row_j).at[j].set(row_i)
    return jnp.where(do, swapped, ind)


def mutate_population(
    key: jax.Array,
    pop: jnp.ndarray,
    sig: Dict[str, jnp.ndarray],
    mutpb: float,
    H: int,
    W: int,
    min_scale: float,
    max_scale: float,
) -> jnp.ndarray:
    """vmapped mutate over a [B, N, 9] population."""
    keys = jax.random.split(key, pop.shape[0])
    return jax.vmap(
        lambda k, ind: mutate_individual(k, ind, sig, mutpb, H, W, min_scale, max_scale)
    )(keys, pop)
