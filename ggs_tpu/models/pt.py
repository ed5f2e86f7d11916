"""Parallel-tempering (replica-exchange) simulated annealing.

A TPU-first extension with no reference analogue (the reference runs one
Metropolis chain, modules/annealing.py:48-190): K replicas explore at a
fixed geometric temperature ladder; every iteration all K proposals
render as ONE fused batch (the same batching win as models/sa.py), each
replica Metropolis-accepts at its own temperature, and every `swap_every`
iterations neighboring replicas exchange configurations with the standard
replica-exchange acceptance

    p = min(1, exp((beta_i - beta_j) (E_i - E_j))),

alternating even/odd pairings so configurations can diffuse across the
whole ladder. Hot replicas escape local optima and tunnel good solutions
down to the cold chain; mutation sigmas scale with sqrt(T/T_cold) so step
sizes match each replica's acceptance regime. The whole update is a
jitted, vectorized device step — no per-replica host work.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GenomeConfig, MutSigma, SAConfig
from ..ops import objective as objective_mod
from ..ops.objective import Objective
from . import genome as genome_mod
from . import operators


class PTState(NamedTuple):
    reps: jnp.ndarray  # [K, N, 9] replica genomes (slot k holds temps[k])
    fits: jnp.ndarray  # [K]
    temps: jnp.ndarray  # [K] fixed ladder, temps[0] = coldest
    best: jnp.ndarray  # [N, 9]
    best_fit: jnp.ndarray  # scalar
    key: jax.Array
    it: jnp.ndarray  # scalar i32

    @property
    def curr_fit(self) -> jnp.ndarray:
        """Coldest replica's energy (the SA driver's 'current' curve)."""
        return self.fits[0]


def temp_ladder(t_cold: float, t_hot: float, k: int) -> jnp.ndarray:
    """Geometric ladder from t_cold (slot 0) to t_hot (slot k-1)."""
    if k == 1:
        return jnp.array([t_cold], jnp.float32)
    r = (t_hot / t_cold) ** (1.0 / (k - 1))
    return jnp.float32(t_cold) * jnp.float32(r) ** jnp.arange(k, dtype=jnp.float32)


def init(
    key: jax.Array,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    gnm: GenomeConfig,
    replicas: int,
    t_cold: float,
    t_hot: float,
) -> PTState:
    key, k0 = jax.random.split(key)
    reps = genome_mod.new_population(
        k0, replicas, gnm.n_splats, obj.H, obj.W, gnm.min_scale, gnm.max_scale
    )
    fits = objective_mod.evaluate(obj, reps, target, weight_mask)
    b = jnp.argmin(fits)
    return PTState(
        reps=reps,
        fits=fits,
        temps=temp_ladder(t_cold, t_hot, replicas),
        best=jnp.copy(reps[b]),
        best_fit=jnp.copy(fits[b]),
        key=key,
        it=jnp.int32(0),
    )


def step(
    state: PTState,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    sa: SAConfig,
    gnm: GenomeConfig,
    sig_max: dict,
    sig_min: dict,
    swap_every: int,
) -> Tuple[PTState, jnp.ndarray]:
    """One PT iteration: K proposals (one fused render), K Metropolis
    updates, and (periodically) a neighbor-swap sweep. Returns
    (state, [best_fit, coldest_fit])."""
    K = state.reps.shape[0]
    it = state.it
    sig = genome_mod.build_mut_sigma(it, sa.iterations, sa.sigma_schedule, sig_max, sig_min)
    key, k_prop, k_acc, k_swap = jax.random.split(state.key, 4)
    tries = sa.tries_per_iter

    # The whole ladder anneals with the SA temperature schedule (the slot-0
    # replica follows exactly the single-chain SA temperature, so PT
    # degenerates gracefully to SA as K -> 1); the geometric ladder sets
    # the fixed ratios between slots. Without this, the cold chain sits at
    # t0 forever and random-walks once typical dE drops below t0 (measured:
    # 2x worse final MSE than annealed SA at equal proposals).
    t_base = genome_mod.temp_schedule(sa.temp_schedule, sa.t0, it, sa.iterations)
    temps_now = state.temps * (t_base / jnp.float32(sa.t0))

    # --- propose tries_per_iter mutants per replica, all from the
    # iteration-start states (models/sa.py "batched" semantics per chain),
    # and render the whole [K * tries] ladder in ONE fused batch ---
    scale = jnp.sqrt(state.temps / state.temps[0])  # [K]

    def mutate(k, ind, s):
        sig_s = {name: v * s for name, v in sig.items()}
        return operators.mutate_individual(
            k, ind, sig_s, sa.mutpb, obj.H, obj.W, gnm.min_scale, gnm.max_scale
        )

    prop_keys = jax.random.split(k_prop, K * tries).reshape(tries, K, 2)
    props = jax.vmap(jax.vmap(mutate), in_axes=(0, None, None))(
        prop_keys, state.reps, scale
    )  # [tries, K, N, 9]
    prop_fits = objective_mod.evaluate(
        obj, props.reshape(tries * K, *props.shape[2:]), target, weight_mask
    ).reshape(tries, K)

    # --- per-replica Metropolis acceptance chain (vectorized over K) ---
    def acc_body(carry, inp):
        reps, fits, k = carry
        prop, e_new = inp
        k, k_u = jax.random.split(k)
        dE = e_new - fits
        u = jax.random.uniform(k_u, (K,))
        accept = (dE <= 0.0) | (u < jnp.exp(-dE / jnp.maximum(temps_now, 1e-30)))
        reps = jnp.where(accept[:, None, None], prop, reps)
        fits = jnp.where(accept, e_new, fits)
        return (reps, fits, k), None

    (reps, fits, _), _ = jax.lax.scan(
        acc_body, (state.reps, state.fits, k_acc), (props, prop_fits)
    )

    # --- replica exchange: alternating-parity neighbor sweep ---
    def swap(reps_fits):
        reps, fits = reps_fits
        i = jnp.arange(K)
        parity = (it // swap_every) % 2
        is_left = (i % 2) == (parity % 2)
        partner = jnp.where(is_left, i + 1, i - 1)
        valid = (partner >= 0) & (partner < K)
        partner = jnp.clip(partner, 0, K - 1)
        beta = 1.0 / jnp.maximum(temps_now, 1e-30)
        # acceptance computed on the left element, mirrored to the right
        arg = (beta - beta[partner]) * (fits - fits[partner])
        p = jnp.exp(jnp.minimum(arg, 0.0))
        u = jax.random.uniform(k_swap, (K,))
        u_pair = jnp.where(is_left, u, u[partner])
        p_pair = jnp.where(is_left, p, p[partner])
        do = valid & (u_pair < p_pair)
        new_i = jnp.where(do, partner, i)
        return reps[new_i], fits[new_i]

    reps, fits = jax.lax.cond(
        (it + 1) % swap_every == 0, swap, lambda rf: rf, (reps, fits)
    )

    # --- global best (1e-12 epsilon like the reference, annealing.py:148) ---
    b = jnp.argmin(fits)
    improved = fits[b] + 1e-12 < state.best_fit
    best = jnp.where(improved, reps[b], state.best)
    best_fit = jnp.where(improved, fits[b], state.best_fit)

    new_state = PTState(reps, fits, state.temps, best, best_fit, key, it + 1)
    return new_state, jnp.stack([best_fit, fits[0]])


def make_run_block(
    obj: Objective,
    sa: SAConfig,
    gnm: GenomeConfig,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
    swap_every: int = 10,
):
    """Jitted (state, target, weight_mask, num_iters) -> (state, metrics [n,2])."""
    sig_max_d = (sig_max or MutSigma.max_defaults()).__dict__
    sig_min_d = (sig_min or MutSigma.min_defaults()).__dict__

    @partial(jax.jit, static_argnames=("num_iters",), donate_argnums=(0,))
    def run(state: PTState, target, weight_mask, num_iters: int):
        def body(st, _):
            return step(
                st, obj, target, weight_mask, sa, gnm, sig_max_d, sig_min_d, swap_every
            )

        return jax.lax.scan(body, state, None, length=num_iters)

    return run
