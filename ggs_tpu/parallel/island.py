"""Island-model GA: per-shard evolution with ring migration.

The GSPMD path (parallel/shard.py) partitions the exact single-chip GA —
global tournament selection costs an all-gather of the parent genomes every
generation. The island model removes that: the population is split into
`n_islands` independent demes (one per pop shard), selection/crossover/
elitism stay within a deme — batched over a leading [I, S] island axis
with S-bounded indices, which GSPMD compiles with NO cross-shard
communication (global-index arithmetic over the sharded [P] axis did NOT
stay local: it compiled a per-generation all-gather — see
benchmarks/island_ab.py) — and every `migrate_every` generations each
deme's k best individuals ride a ring permute to the next deme
(shard.migrate_ring), replacing its k worst. This is the classic
distributed-GA topology and the cheap-collective design SURVEY.md §2.4
calls for.

With n_islands == 1 the step reduces exactly to models/ga.step.

Measured (island_ab.py on the 8-virtual-device mesh, RESULTS_v5e.md):
fewer collectives per compiled block (AG 9→8, AR 5→4, CP 6→2) and +13.5%
gens/s — but +23% equal-budget MSE at pop 64 / 16-candidate demes.
Global GSPMD selection stays the recommended default; use islands only
when per-generation cross-host gathers dominate (DCN meshes) AND demes
stay large (≥64).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GAConfig, GenomeConfig, MutSigma
from ..models import genome as genome_mod
from ..models import operators
from ..models.ga import GAState
from ..ops import objective as objective_mod
from ..ops.objective import Objective
from . import shard as shard_mod


def _island_tournament(key, fits_i: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-island k-way tournaments on [I, S] fitness: LOCAL winner indices
    [I, S] in [0, S).

    Deliberately batched over a leading island axis with S-bounded indices
    (take_along_axis on axis 1), NOT global-index arithmetic over [P]: the
    GSPMD partitioner proves batched gathers local to each pop shard,
    whereas `fits[base + local]` over the sharded [P] axis compiled to a
    per-generation all-gather — measured in benchmarks/island_ab.py, which
    is this layer's whole reason to exist (module docstring)."""
    I, S = fits_i.shape
    idx = jax.random.randint(key, (I, S, k), 0, S)
    cand = jnp.take_along_axis(fits_i, idx.reshape(I, S * k), axis=1).reshape(I, S, k)
    win = jnp.argmin(cand, axis=-1)
    return jnp.take_along_axis(idx, win[..., None], axis=2)[..., 0]


def _island_shuffle(key, x_i: jnp.ndarray) -> jnp.ndarray:
    """Shuffle [I, S, N, 9] rows independently within each island (argsort
    of uniforms — shard-local for the same reason as _island_tournament)."""
    I, S = x_i.shape[:2]
    u = jax.random.uniform(key, (I, S))
    order = jnp.argsort(u, axis=1)
    return jnp.take_along_axis(x_i, order[:, :, None, None], axis=1)


def step(
    state: GAState,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask,
    ga: GAConfig,
    gnm: GenomeConfig,
    sig_max: dict,
    sig_min: dict,
    n_islands: int,
    migrate_every: int = 0,
    migrate_k: int = 1,
    mesh=None,
) -> Tuple[GAState, jnp.ndarray]:
    """One island-GA generation over the global [P, N, 9] array."""
    P, N, _ = state.pop.shape
    I = n_islands
    S = P // I
    E = max(1, min(ga.elite_k, S - 1))
    key, k_sel, k_shuf, k_cx, k_cxm, k_mut, k_mig = jax.random.split(state.key, 7)
    gen = state.gen + 1

    # Everything deme-local runs on [I, S]-shaped arrays with S-bounded
    # indices (see _island_tournament: this is what keeps GSPMD from
    # inserting per-generation all-gathers on the pop axis).
    pop_i = state.pop.reshape(I, S, N, 9)
    fits_i = state.fits.reshape(I, S)
    sel = _island_tournament(k_sel, fits_i, ga.tour_k)  # [I, S] local
    parents = jnp.take_along_axis(pop_i, sel[:, :, None, None], axis=1)
    parents = _island_shuffle(k_shuf, parents)

    a = parents[:, 0::2]  # [I, S//2, N, 9] — pairs stay within their deme
    b = parents[:, 1::2]
    do_cx = jax.random.uniform(k_cx, (I, S // 2, 1, 1)) < ga.cxpb
    m = jax.random.uniform(k_cxm, (I, S // 2, N, 1)) < 0.5
    m_eff = m | ~do_cx
    c1 = jnp.where(m_eff, a, b)
    c2 = jnp.where(m_eff, b, a)
    offspring = jnp.stack([c1, c2], axis=2).reshape(P, N, 9)

    sig = genome_mod.build_mut_sigma(gen, ga.generations, ga.schedule, sig_max, sig_min)
    offspring = operators.mutate_population(
        k_mut, offspring, sig, ga.mutpb, obj.H, obj.W, gnm.min_scale, gnm.max_scale
    )
    off_fits = objective_mod.evaluate(obj, offspring, target, weight_mask)

    # Per-island elitism (pop_i/fits_i from the selection block above)
    _, elite_idx = jax.lax.top_k(-fits_i, E)  # [I, E]
    elites = jnp.take_along_axis(pop_i, elite_idx[:, :, None, None], axis=1)
    elite_fits = jnp.take_along_axis(fits_i, elite_idx, axis=1)

    off_i = offspring.reshape(n_islands, S, N, 9)
    offf_i = off_fits.reshape(n_islands, S)
    pop = jnp.concatenate([elites, off_i[:, : S - E]], axis=1).reshape(P, N, 9)
    fits = jnp.concatenate([elite_fits, offf_i[:, : S - E]], axis=1).reshape(P)

    # Ring migration (a collective-permute over the pop axis under GSPMD)
    if migrate_every and n_islands > 1 and mesh is not None:
        def migrate(args):
            p, f = args
            return shard_mod.migrate_ring(p, f, migrate_k, mesh)

        pop, fits = jax.lax.cond(
            gen % migrate_every == 0, migrate, lambda x: x, (pop, fits)
        )
    elif migrate_every and n_islands > 1:
        # meshless variant (tests / single host): same roll, no mesh needed
        def migrate(args):
            p, f = args
            return _migrate_roll(p, f, migrate_k, n_islands)

        pop, fits = jax.lax.cond(
            gen % migrate_every == 0, migrate, lambda x: x, (pop, fits)
        )

    gb = jnp.argmin(fits)
    improved = fits[gb] + 1e-10 < state.best_fit
    best = jnp.where(improved, pop[gb], state.best)
    best_fit = jnp.where(improved, fits[gb], state.best_fit)
    no_improve = jnp.where(improved, 0, state.no_improve + 1)

    # Same 4-column layout as ga.step (col 3 = on-device stall counter)
    metrics = jnp.stack(
        [best_fit, jnp.mean(fits), jnp.median(fits), no_improve.astype(fits.dtype)]
    )
    return GAState(pop, fits, best, best_fit, no_improve.astype(jnp.int32), key, gen), metrics


def _migrate_roll(pop, fits, k, n_islands):
    """Mesh-free ring migration over island blocks (same math as
    shard.migrate_ring with n_shards = n_islands)."""
    P = pop.shape[0]
    S = P // n_islands
    pop_s = pop.reshape(n_islands, S, *pop.shape[1:])
    fits_s = fits.reshape(n_islands, S)
    _, best_idx = jax.lax.top_k(-fits_s, k)
    migrants = jnp.take_along_axis(pop_s, best_idx[:, :, None, None], axis=1)
    migrant_fits = jnp.take_along_axis(fits_s, best_idx, axis=1)
    migrants = jnp.roll(migrants, 1, axis=0)
    migrant_fits = jnp.roll(migrant_fits, 1, axis=0)
    _, worst_idx = jax.lax.top_k(fits_s, k)
    pop_s = jax.vmap(lambda p, w, mg: p.at[w].set(mg))(pop_s, worst_idx, migrants)
    fits_s = jax.vmap(lambda f, w, mf: f.at[w].set(mf))(fits_s, worst_idx, migrant_fits)
    return pop_s.reshape(P, *pop.shape[1:]), fits_s.reshape(P)


def make_run_block(
    obj: Objective,
    ga: GAConfig,
    gnm: GenomeConfig,
    n_islands: int,
    migrate_every: int = 0,
    migrate_k: int = 1,
    mesh=None,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
):
    """Jitted (state, target, weight_mask, num_gens) -> (state, metrics)."""
    if ga.pop_size % n_islands:
        raise ValueError(
            f"pop_size {ga.pop_size} must divide into n_islands {n_islands}"
        )
    if n_islands > 1 and (ga.pop_size // n_islands) % 2:
        raise ValueError(
            "island demes need an even size for within-deme pairing: "
            f"pop_size {ga.pop_size} / n_islands {n_islands} is odd"
        )
    sig_max_d = (sig_max or MutSigma.max_defaults()).__dict__
    sig_min_d = (sig_min or MutSigma.min_defaults()).__dict__

    @partial(jax.jit, static_argnames=("num_gens",), donate_argnums=(0,))
    def run(state: GAState, target, weight_mask, num_gens: int):
        def body(st, _):
            return step(
                st, obj, target, weight_mask, ga, gnm, sig_max_d, sig_min_d,
                n_islands, migrate_every, migrate_k, mesh,
            )

        return jax.lax.scan(body, state, None, length=num_gens)

    return run
