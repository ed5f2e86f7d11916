"""Simulated annealing as a jitted device step.

The reference SA (modules/annealing.py:48-190) renders ONE candidate per
proposal and syncs to host 8x per iteration (annealing.py:121-131). The
TPU-first default here ("batched") proposes all `tries_per_iter` mutants
from the iteration-start state, renders them as one batch, then applies the
Metropolis acceptance chain sequentially in a lax.scan — one render and
zero host syncs per iteration. `proposal_mode="sequential"` reproduces the
reference's exact chaining (each proposal mutates the possibly-updated
current state) at the cost of batch-1 renders. Temperature schedules,
1e-12 best epsilon, and best/current curves match annealing.py:29-44,
148-154.
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


class SAState(NamedTuple):
    curr: jnp.ndarray  # [N, 9]
    curr_fit: jnp.ndarray  # scalar
    best: jnp.ndarray  # [N, 9]
    best_fit: jnp.ndarray  # scalar
    key: jax.Array
    it: jnp.ndarray  # scalar i32


def init(
    key: jax.Array,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    gnm: GenomeConfig,
) -> SAState:
    key, k0 = jax.random.split(key)
    curr = genome_mod.new_individual(
        k0, gnm.n_splats, obj.H, obj.W, gnm.min_scale, gnm.max_scale
    )
    fit = objective_mod.evaluate(obj, curr[None], target, weight_mask)[0]
    # best is a distinct buffer: the state is donated to jitted run blocks,
    # and XLA rejects donating one buffer twice.
    return SAState(curr, fit, jnp.copy(curr), jnp.copy(fit), key, jnp.int32(0))


def _metropolis(key, curr, curr_fit, prop, prop_fit, T):
    """One accept/reject (modules/annealing.py:133-146)."""
    dE = prop_fit - curr_fit
    u = jax.random.uniform(key)
    accept = (dE <= 0.0) | (u < jnp.exp(-dE / jnp.maximum(T, 1e-30)))
    new_curr = jnp.where(accept, prop, curr)
    new_fit = jnp.where(accept, prop_fit, curr_fit)
    return new_curr, new_fit, accept


def step(
    state: SAState,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    sa: SAConfig,
    gnm: GenomeConfig,
    sig_max: dict,
    sig_min: dict,
) -> Tuple[SAState, jnp.ndarray]:
    """One SA iteration (= tries_per_iter proposals). Returns (state, [best, current])."""
    it = state.it
    T = genome_mod.temp_schedule(sa.temp_schedule, sa.t0, it, sa.iterations)
    sig = genome_mod.build_mut_sigma(it, sa.iterations, sa.sigma_schedule, sig_max, sig_min)
    key, k_prop, k_acc = jax.random.split(state.key, 3)
    tries = sa.tries_per_iter

    def mutate(k, ind):
        return operators.mutate_individual(
            k, ind, sig, sa.mutpb, obj.H, obj.W, gnm.min_scale, gnm.max_scale
        )

    if sa.proposal_mode == "batched":
        # All proposals from the iteration-start state; one batched render.
        prop_keys = jax.random.split(k_prop, tries)
        props = jax.vmap(mutate, in_axes=(0, None))(prop_keys, state.curr)
        prop_fits = objective_mod.evaluate(obj, props, target, weight_mask)

        def acc_body(carry, inp):
            curr, curr_fit, best, best_fit, k = carry
            prop, e_new = inp
            k, k_u = jax.random.split(k)
            curr, curr_fit, _ = _metropolis(k_u, curr, curr_fit, prop, e_new, T)
            improved = curr_fit + 1e-12 < best_fit
            best = jnp.where(improved, curr, best)
            best_fit = jnp.where(improved, curr_fit, best_fit)
            return (curr, curr_fit, best, best_fit, k), None

        (curr, curr_fit, best, best_fit, _), _ = jax.lax.scan(
            acc_body,
            (state.curr, state.curr_fit, state.best, state.best_fit, k_acc),
            (props, prop_fits),
        )
    elif sa.proposal_mode == "sequential":
        # Exact reference chaining: each proposal mutates the updated state
        # (annealing.py:121-146); renders are batch-1 inside the scan.
        def try_body(carry, k):
            curr, curr_fit, best, best_fit = carry
            k_m, k_u = jax.random.split(k)
            prop = mutate(k_m, curr)
            e_new = objective_mod.evaluate(obj, prop[None], target, weight_mask)[0]
            curr, curr_fit, _ = _metropolis(k_u, curr, curr_fit, prop, e_new, T)
            improved = curr_fit + 1e-12 < best_fit
            best = jnp.where(improved, curr, best)
            best_fit = jnp.where(improved, curr_fit, best_fit)
            return (curr, curr_fit, best, best_fit), None

        try_keys = jax.random.split(k_prop, tries)
        (curr, curr_fit, best, best_fit), _ = jax.lax.scan(
            try_body, (state.curr, state.curr_fit, state.best, state.best_fit), try_keys
        )
    else:
        raise ValueError(f"unknown proposal_mode: {sa.proposal_mode!r}")

    new_state = SAState(curr, curr_fit, best, best_fit, key, it + 1)
    return new_state, jnp.stack([best_fit, curr_fit])


def make_run_block(
    obj: Objective,
    sa: SAConfig,
    gnm: GenomeConfig,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
):
    """Build a jitted (state, target, weight_mask, num_iters) -> (state, metrics)."""
    sig_max_d = (sig_max or MutSigma.max_defaults()).__dict__
    sig_min_d = (sig_min or MutSigma.min_defaults()).__dict__

    @partial(jax.jit, static_argnames=("num_iters",), donate_argnums=(0,))
    def run(state: SAState, target, weight_mask, num_iters: int):
        def body(st, _):
            return step(st, obj, target, weight_mask, sa, gnm, sig_max_d, sig_min_d)

        return jax.lax.scan(body, state, None, length=num_iters)

    return run


def simulated_annealing(
    target_img,
    H: int,
    W: int,
    *,
    obj: Objective,
    sa: SAConfig,
    gnm: GenomeConfig,
    mask_cfg=None,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
    seed: int = 42,
    log_every: int = 50,
    save_video: bool = False,
    frame_every: int = 10_000,
    video_dir: str = "",
    prefix: str = "sa",
    loss_png_path: str = "",
    loss_csv_path: str = "",
    loss_log_y: bool = False,
    checkpoint_path: str = "",
    checkpoint_every: int = 0,
    resume_from: str = "",
    progress: bool = True,
    replicas: int = 1,
    swap_every: int = 10,
    t_hot: float = 0.0,
):
    """Host driver: full SA run (run_sags.py / annealing.py:48-190 equivalent).

    replicas > 1 switches to parallel tempering (models/pt.py): K chains at
    a geometric temperature ladder from sa.t0 (cold) to t_hot (default
    100*t0), all proposals rendered as one fused batch, neighbor
    configuration swaps every `swap_every` iterations. The 'current' curve
    then tracks the coldest replica.

    Returns (best_genome [N,9] np, best_fit float, curves dict).
    """
    import numpy as np

    from ..config import MaskConfig
    from ..ops import mask as mask_mod
    from ..utils import checkpoint as ckpt_mod
    from ..utils import curves as curves_mod
    from ..utils import io as io_mod

    mask_cfg = mask_cfg if mask_cfg is not None else MaskConfig()
    target = io_mod.ensure_hw(jnp.asarray(target_img), H, W)
    weight_mask = mask_mod.compute_importance_mask(
        target,
        H,
        W,
        edge_scales=tuple(mask_cfg.edge_scales),
        w_edge=mask_cfg.w_edge,
        w_var=mask_cfg.w_var,
        gamma=mask_cfg.gamma,
        floor=mask_cfg.floor,
        smooth=mask_cfg.smooth,
        strength=mask_cfg.strength,
    )

    key = jax.random.PRNGKey(seed)
    if replicas > 1:
        from . import pt as pt_mod

        state = pt_mod.init(
            key, obj, target, weight_mask, gnm, replicas,
            t_cold=sa.t0, t_hot=t_hot if t_hot > 0 else 100.0 * sa.t0,
        )
        run = pt_mod.make_run_block(obj, sa, gnm, sig_max, sig_min, swap_every)
    else:
        state = init(key, obj, target, weight_mask, gnm)
        run = make_run_block(obj, sa, gnm, sig_max, sig_min)
    start_it = 0
    curves = {"best": [float(state.best_fit)], "current": [float(state.curr_fit)]}
    if resume_from:
        state, meta = ckpt_mod.load_checkpoint(resume_from, state)
        start_it = int(meta.get("it", 0))
        curves = meta.get("curves", curves)

    pad = len(str(sa.iterations))
    if save_video and start_it == 0:
        io_mod.save_frame_png(
            0, state.best, pad, prefix, video_dir, H, W, obj.k_sigma, save_video, impl=obj.impl
        )

    pbar = None
    if progress:
        try:
            from tqdm.auto import tqdm

            pbar = tqdm(total=sa.iterations, initial=start_it, desc="SA iterations")
        except Exception:
            pbar = None

    it = start_it
    last_frame_bucket = it // max(1, frame_every)
    # Honor a frame cadence finer than the logging cadence (see ga.py).
    block_size = max(1, min(log_every, frame_every) if save_video else log_every)
    try:
        while it < sa.iterations:
            block = min(block_size, sa.iterations - it)
            state, metrics = run(state, target, weight_mask, block)
            metrics = np.asarray(jax.device_get(metrics))
            curves["best"].extend(metrics[:, 0].tolist())
            curves["current"].extend(metrics[:, 1].tolist())
            it += block

            if save_video:
                bucket = it // max(1, frame_every)
                if bucket > last_frame_bucket:
                    last_frame_bucket = bucket
                    io_mod.save_frame_png(
                        it, state.best, pad, prefix, video_dir, H, W, obj.k_sigma,
                        save_video, impl=obj.impl,
                    )
            if checkpoint_path and checkpoint_every and it % checkpoint_every < block:
                ckpt_mod.save_checkpoint(checkpoint_path, state, meta={"it": it, "curves": curves})
            if pbar is not None:
                T = float(genome_mod.temp_schedule(sa.temp_schedule, sa.t0, it, sa.iterations))
                pbar.update(block)
                pbar.set_postfix(
                    best_mse=f"{float(state.best_fit):.6f}",
                    curr_mse=f"{float(state.curr_fit):.6f}",
                    T=f"{T:.4g}",
                )
    except KeyboardInterrupt:
        print("\n[Interrupted] Returning current best…", flush=True)
    finally:
        if pbar is not None:
            pbar.close()

    try:
        curves_mod.save_loss_curve_png(
            curves, loss_png_path, title=f"{prefix} energy (MSE)", xlabel="Iteration",
            ylabel="MSE", log_y=loss_log_y,
        )
        curves_mod.save_curves_csv(curves, loss_csv_path)
    except Exception as e:  # pragma: no cover
        print(f"[warn] Could not save SA curves: {e}")

    io_mod.flush_frames()
    best = np.asarray(jax.device_get(state.best))
    return best, float(state.best_fit), curves
