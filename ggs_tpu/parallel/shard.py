"""Sharded GA/SA execution over a (pop, tile) mesh.

Two pieces:

* `place_*` helpers commit arrays to their mesh shardings (population over
  `pop`; target/mask rows over `tile`; everything else replicated), so the
  jitted generation step runs as one GSPMD program: mutation/render/fitness
  partition over both axes, fitness partials reduce over `tile`, and global
  selection/elitism turn into a tiny fitness all-gather — exactly the
  collective structure SURVEY.md §2.4 prescribes. Semantics are identical
  to the single-chip step (same program, partitioned by XLA).

* `migrate_ring`: optional island-model genome exchange via ppermute-style
  rolls over the pop axis, for runs that use per-shard selection.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ga import GAState
from ..ops.objective import Objective
from . import mesh as mesh_mod


def sharded_objective(obj: Objective, mesh: Mesh) -> Objective:
    """Attach the mesh + canvas partition spec to an Objective."""
    return obj._replace(
        mesh=mesh, pspec_imgs=(mesh_mod.POP_AXIS, mesh_mod.TILE_AXIS, None, None)
    )


def place_target(target: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(target, mesh_mod.target_sharding(mesh))


def place_mask(weight_mask: Optional[jnp.ndarray], mesh: Mesh):
    if weight_mask is None:
        return None
    return jax.device_put(weight_mask, mesh_mod.mask_sharding(mesh))


def place_ga_state(state: GAState, mesh: Mesh) -> GAState:
    """Commit GA state: population sharded over pop, scalars/best replicated."""
    pop_s = mesh_mod.pop_sharding(mesh)
    rep = mesh_mod.replicated(mesh)
    return GAState(
        pop=jax.device_put(state.pop, pop_s),
        fits=jax.device_put(state.fits, NamedSharding(mesh, P(mesh_mod.POP_AXIS))),
        best=jax.device_put(state.best, rep),
        best_fit=jax.device_put(state.best_fit, rep),
        no_improve=jax.device_put(state.no_improve, rep),
        key=jax.device_put(state.key, rep),
        gen=jax.device_put(state.gen, rep),
    )


def migrate_ring(pop: jnp.ndarray, fits: jnp.ndarray, k: int, mesh: Mesh):
    """Island-model migration: roll each shard's k best individuals to the
    next pop shard (ring over the pop axis), replacing the receiver's k
    worst. Expressed as a global roll by the shard size so GSPMD lowers it
    to a ppermute over ICI neighbors.
    """
    P_total = pop.shape[0]
    n_shards = mesh.shape[mesh_mod.POP_AXIS]
    shard = P_total // n_shards

    # k best per shard (local top-k within each shard's slice)
    pop_s = pop.reshape(n_shards, shard, *pop.shape[1:])
    fits_s = fits.reshape(n_shards, shard)
    _, best_idx = jax.lax.top_k(-fits_s, k)  # [n_shards, k]
    migrants = jnp.take_along_axis(pop_s, best_idx[:, :, None, None], axis=1)
    migrant_fits = jnp.take_along_axis(fits_s, best_idx, axis=1)

    # ring shift: shard i receives from shard i-1
    migrants = jnp.roll(migrants, 1, axis=0)
    migrant_fits = jnp.roll(migrant_fits, 1, axis=0)

    # replace each shard's k worst
    _, worst_idx = jax.lax.top_k(fits_s, k)  # [n_shards, k]
    pop_s = jax.vmap(lambda p, w, m: p.at[w].set(m))(pop_s, worst_idx, migrants)
    fits_s = jax.vmap(lambda f, w, mf: f.at[w].set(mf))(fits_s, worst_idx, migrant_fits)
    return pop_s.reshape(P_total, *pop.shape[1:]), fits_s.reshape(P_total)
