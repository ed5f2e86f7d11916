"""Generational GA with elitism, as a single jitted device step.

The reference's loop (modules/algorithm.py:85-163) runs selection,
crossover, and mutation on host Python over a list of tensors, with a
device->host fitness sync every generation (fitness.py:42). Here one
generation — tournament selection, pairwise uniform crossover, vmapped
mutation, offspring evaluation, elitism, best tracking — is one traced
function over a [P, N, 9] population array, and `run_block` scans
`log_every` generations per host round-trip. Semantics preserved:
tournament-with-replacement, per-pair cxpb gating, annealed mutation
sigmas, elite_k best carried over, 1e-10 best-improvement epsilon, and
best/mean/median curves per generation (algorithm.py:71-75, 144-155).
Consciously fixed (SURVEY.md §7): elites are not re-rendered every
generation unless GAConfig.reeval_elites — fitness is deterministic.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GAConfig, GenomeConfig, MutSigma
from ..ops import objective as objective_mod
from ..ops.objective import Objective
from . import genome as genome_mod
from . import operators


class GAState(NamedTuple):
    pop: jnp.ndarray  # [P, N, 9] axes-angle genomes
    fits: jnp.ndarray  # [P]
    best: jnp.ndarray  # [N, 9]
    best_fit: jnp.ndarray  # scalar f32
    no_improve: jnp.ndarray  # scalar i32
    key: jax.Array
    gen: jnp.ndarray  # scalar i32


def init(
    key: jax.Array,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    ga: GAConfig,
    gnm: GenomeConfig,
    init_pop: Optional[jnp.ndarray] = None,
) -> GAState:
    """Fresh population + initial evaluation (modules/algorithm.py:55-68).

    init_pop warm-starts from an existing [pop_size, N, 9] axes-angle
    population (e.g. a coarser resolution's result rescaled by
    codec.scale_genome_pixels_anisotropic); it is re-clamped to this
    resolution's scale domain before evaluation.
    """
    key, k_pop = jax.random.split(key)
    if init_pop is not None:
        pop = jnp.asarray(init_pop, jnp.float32)
        assert pop.shape == (ga.pop_size, gnm.n_splats, 9), pop.shape
        from ..ops import codec as codec_mod

        pop = codec_mod.clamp_genome(
            pop, obj.H, obj.W, gnm.min_scale, gnm.max_scale
        )
    else:
        pop = genome_mod.new_population(
            k_pop, ga.pop_size, gnm.n_splats, obj.H, obj.W, gnm.min_scale, gnm.max_scale
        )
    fits = objective_mod.evaluate(obj, pop, target, weight_mask)
    b = jnp.argmin(fits)
    return GAState(
        pop=pop,
        fits=fits,
        best=pop[b],
        best_fit=fits[b],
        no_improve=jnp.int32(0),
        key=key,
        gen=jnp.int32(0),
    )


def _offspring(
    key: jax.Array, pop: jnp.ndarray, fits: jnp.ndarray, ga: GAConfig, gen: jnp.ndarray,
    obj: Objective, gnm: GenomeConfig, sig_max: dict, sig_min: dict,
) -> jnp.ndarray:
    """Selection + crossover + mutation -> [P, N, 9] offspring."""
    P, N, _ = pop.shape
    k_sel, k_shuf, k_cx, k_cxm, k_mut = jax.random.split(key, 5)

    # Tournament parents, then shuffle (algorithm.py:87-91)
    sel = operators.tournament_selection(k_sel, fits, P, ga.tour_k)
    parents = pop[sel][jax.random.permutation(k_shuf, P)]

    # Pair off; crossover each pair w.p. cxpb else clone (algorithm.py:94-100)
    a = parents[0::2]
    b = parents[1::2]
    do_cx = jax.random.uniform(k_cx, (P // 2, 1, 1)) < ga.cxpb
    m = jax.random.uniform(k_cxm, (P // 2, N, 1)) < 0.5
    m_eff = m | ~do_cx  # not crossing -> child1 = a, child2 = b
    c1 = jnp.where(m_eff, a, b)
    c2 = jnp.where(m_eff, b, a)
    offspring = jnp.stack([c1, c2], axis=1).reshape(P, N, 9)

    sig = genome_mod.build_mut_sigma(gen, ga.generations, ga.schedule, sig_max, sig_min)
    return operators.mutate_population(
        k_mut, offspring, sig, ga.mutpb, obj.H, obj.W, gnm.min_scale, gnm.max_scale
    )


def step(
    state: GAState,
    obj: Objective,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    ga: GAConfig,
    gnm: GenomeConfig,
    sig_max: dict,
    sig_min: dict,
    blur_sigma=None,
) -> Tuple[GAState, jnp.ndarray]:
    """One generation. Returns (state, [best, mean, median] of the new pop).

    With `blur_sigma` (a traced scalar), candidates are EVALUATED at scale
    sigma (ops/anneal.blur_genome_axes) against a caller-blurred target —
    the continuous coarse-to-fine homotopy (docs/DESIGN.md §9c). The
    population itself evolves unblurred; only the fitness landscape is
    smoothed, and sigma being dynamic means one compiled step serves the
    whole schedule.
    """
    P = state.pop.shape[0]
    # Clamp so elitism always leaves at least one offspring slot (an
    # elite_k >= pop_size config otherwise crashes top_k / freezes the
    # population — caught by the run_pipeline CLI smoke test).
    E = max(1, min(ga.elite_k, P - 1)) if P > 1 else 1
    key, k_off = jax.random.split(state.key)
    gen = state.gen + 1

    def at_scale(g):
        if blur_sigma is None:
            return g
        from ..ops import anneal as anneal_mod

        return anneal_mod.blur_genome_axes(g, blur_sigma)

    offspring = _offspring(k_off, state.pop, state.fits, ga, gen, obj, gnm, sig_max, sig_min)
    off_fits = objective_mod.evaluate(obj, at_scale(offspring), target, weight_mask)

    # Elitism: keep the E best of the current population (algorithm.py:129-141)
    _, elite_idx = jax.lax.top_k(-state.fits, E)
    elites = state.pop[elite_idx]
    if ga.reeval_elites:
        elite_fits = objective_mod.evaluate(obj, at_scale(elites), target, weight_mask)
    else:
        elite_fits = state.fits[elite_idx]

    pop = jnp.concatenate([elites, offspring[: P - E]], axis=0)
    fits = jnp.concatenate([elite_fits, off_fits[: P - E]], axis=0)

    gb = jnp.argmin(fits)
    improved = fits[gb] + 1e-10 < state.best_fit
    best = jnp.where(improved, pop[gb], state.best)
    best_fit = jnp.where(improved, fits[gb], state.best_fit)
    no_improve = jnp.where(improved, 0, state.no_improve + 1)

    # Column 3 carries the on-device stall counter so host drivers read it
    # from the metrics they already pull per block instead of paying an
    # extra ~25 ms device_get for state.no_improve (round-2 verdict #7).
    metrics = jnp.stack(
        [best_fit, jnp.mean(fits), jnp.median(fits), no_improve.astype(fits.dtype)]
    )
    new_state = GAState(pop, fits, best, best_fit, no_improve.astype(jnp.int32), key, gen)
    return new_state, metrics


def make_run_block(
    obj: Objective,
    ga: GAConfig,
    gnm: GenomeConfig,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
):
    """Build a jitted (state, target, weight_mask, num_gens) -> (state, metrics)."""
    sig_max_d = (sig_max or MutSigma.max_defaults()).__dict__
    sig_min_d = (sig_min or MutSigma.min_defaults()).__dict__

    @partial(jax.jit, static_argnames=("num_gens",), donate_argnums=(0,))
    def run(state: GAState, target, weight_mask, num_gens: int, blur_sigma=None):
        def body(st, _):
            return step(
                st, obj, target, weight_mask, ga, gnm, sig_max_d, sig_min_d,
                blur_sigma=blur_sigma,
            )

        return jax.lax.scan(body, state, None, length=num_gens)

    return run


def make_memetic_run_block(
    obj: Objective,
    ga: GAConfig,
    gnm: GenomeConfig,
    grad_cfg,
    refine_every: int,
    refine_steps: int,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
):
    """Hybrid GA+SGD memetic loop (BASELINE.md config): the plain GA
    generation step, plus — every `refine_every` generations — a
    Lamarckian Adam refinement of the elites through the differentiable
    renderer. Refined elites replace themselves only when improved, so the
    best-fitness curve stays monotone.
    """
    from . import gradient

    sig_max_d = (sig_max or MutSigma.max_defaults()).__dict__
    sig_min_d = (sig_min or MutSigma.min_defaults()).__dict__
    E = max(1, ga.elite_k)

    @partial(jax.jit, static_argnames=("num_gens",), donate_argnums=(0,))
    def run(state: GAState, target, weight_mask, num_gens: int):
        def refine(st: GAState) -> GAState:
            el, ef = gradient.refine_elites(
                st.pop[:E], st.fits[:E], target, weight_mask, obj, gnm,
                grad_cfg, refine_steps,
            )
            pop = st.pop.at[:E].set(el)
            fits = st.fits.at[:E].set(ef)
            gb = jnp.argmin(fits)
            improved = fits[gb] + 1e-10 < st.best_fit
            return GAState(
                pop=pop,
                fits=fits,
                best=jnp.where(improved, pop[gb], st.best),
                best_fit=jnp.where(improved, fits[gb], st.best_fit),
                no_improve=jnp.where(improved, 0, st.no_improve).astype(jnp.int32),
                key=st.key,
                gen=st.gen,
            )

        def body(st, _):
            st, metrics = step(st, obj, target, weight_mask, ga, gnm, sig_max_d, sig_min_d)
            st = jax.lax.cond(
                st.gen % refine_every == 0, refine, lambda s: s, st
            )
            metrics = metrics.at[0].set(st.best_fit)
            metrics = metrics.at[3].set(st.no_improve.astype(metrics.dtype))
            return st, metrics

        return jax.lax.scan(body, state, None, length=num_gens)

    return run


def genetic_approx(
    target_img,
    H: int,
    W: int,
    *,
    obj: Objective,
    ga: GAConfig,
    gnm: GenomeConfig,
    mask_cfg=None,
    sig_max: Optional[MutSigma] = None,
    sig_min: Optional[MutSigma] = None,
    seed: int = 42,
    log_every: int = 50,
    save_video: bool = False,
    frame_every: int = 5000,
    video_dir: str = "",
    prefix: str = "ga",
    loss_png_path: str = "",
    loss_csv_path: str = "",
    loss_log_y: bool = False,
    checkpoint_path: str = "",
    checkpoint_every: int = 0,
    resume_from: str = "",
    progress: bool = True,
    mesh=None,
    n_islands: int = 1,
    migrate_every: int = 0,
    migrate_k: int = 1,
    profile_dir: str = "",
    init_pop=None,
    return_state: bool = False,
    recycle_every: int = 0,
    recycle_k: int = 0,
    recycle_patience: int = 0,
    stall_patience: int = 0,
    weight_mask=None,
    anneal_sigma0: float = 0.0,
    anneal_frac: float = 0.6,
    memetic_every: int = 0,
    memetic_steps: int = 5,
    memetic_lr: float = 1e-2,
):
    """Host driver: full GA run with curves/frames/checkpoints.

    The run_ggs.py / modules/algorithm.py:17-195 equivalent. The host loop
    only paces logging: `log_every` generations execute per jitted block
    (one device round-trip each), so raising it amortizes sync cost.

    With `mesh` set, the population/target are placed on the (pop, tile)
    mesh and the step runs SPMD; `n_islands > 1` switches to deme-local
    selection with ring migration (parallel/island.py). `profile_dir`
    captures a jax.profiler trace of the first post-warmup block.
    `init_pop` warm-starts from an existing population (see init()).
    recycle_every/recycle_k enable the densify+prune cycle at fixed N
    (models/grow.recycle_population) between jitted blocks: every
    recycle_every generations each candidate's recycle_k lowest-impact
    splats are replaced by error-guided ones and the population is
    re-evaluated.
    memetic_every > 0 switches to the hybrid GA+SGD block
    (make_memetic_run_block): every memetic_every generations the elites
    get memetic_steps Lamarckian Adam steps through the differentiable
    renderer, accepted only when improved ON THE GA'S OWN ENERGY
    (refine_elites rescores with objective.evaluate, so fast/mix modes
    stay commensurate). Single-deme only; exclusive with annealing.
    anneal_sigma0 > 0 turns on scale-space annealing (ops/anneal, DESIGN
    §9c): evaluation runs against a sigma-blurred target with sigma-blurred
    candidates, sigma decaying geometrically from anneal_sigma0 to 0 over
    the first anneal_frac of the budget. sigma is a dynamic scalar (no
    recompiles); the population is re-scored whenever sigma steps, so
    curve values during the anneal phase are energies of the CURRENT
    smoothed landscape. The importance mask stays the unblurred target's
    (the §9 fixed-mask lesson). Not supported with n_islands > 1.
    Returns (best_genome [N,9] np, best_fit float, curves dict), plus the
    final population [P,N,9] np when `return_state` (for stage chaining).
    """
    import time as time_mod

    import numpy as np

    from ..config import MaskConfig
    from ..ops import mask as mask_mod
    from ..utils import checkpoint as ckpt_mod
    from ..utils import curves as curves_mod
    from ..utils import io as io_mod
    from ..utils import profiling

    mask_cfg = mask_cfg if mask_cfg is not None else MaskConfig()

    target = io_mod.ensure_hw(jnp.asarray(target_img), H, W)
    if weight_mask is None:
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
    else:
        # Caller-fixed mask (e.g. run_ga --fixed-mask: one mask computed at
        # the final resolution and resized per stage, so progressive stages
        # share one fitness landscape instead of re-deriving it per stage).
        weight_mask = jnp.asarray(weight_mask, jnp.float32)
        assert weight_mask.shape == (H, W), (weight_mask.shape, (H, W))

    if mesh is not None:
        from ..parallel import shard as shard_mod

        obj = shard_mod.sharded_objective(obj, mesh)

    key = jax.random.PRNGKey(seed)
    state = init(key, obj, target, weight_mask, ga, gnm, init_pop=init_pop)
    start_gen = 0
    curves = {
        "best": [float(state.best_fit)],
        "mean": [float(jnp.mean(state.fits))],
        "median": [float(jnp.median(state.fits))],
    }
    if resume_from:
        state, meta = ckpt_mod.load_checkpoint(resume_from, state)
        start_gen = int(meta.get("gen", 0))
        curves = meta.get("curves", curves)

    if mesh is not None:
        from ..parallel import shard as shard_mod

        state = shard_mod.place_ga_state(state, mesh)
        target = shard_mod.place_target(target, mesh)
        weight_mask = shard_mod.place_mask(weight_mask, mesh)

    if n_islands > 1:
        from ..parallel import island as island_mod

        assert memetic_every == 0, "memetic refinement is single-deme only"
        run = island_mod.make_run_block(
            obj, ga, gnm, n_islands, migrate_every, migrate_k, mesh, sig_max, sig_min
        )
    elif memetic_every > 0:
        assert anneal_sigma0 == 0.0, (
            "memetic refinement and scale-space annealing are mutually "
            "exclusive (the memetic block has no sigma input)"
        )
        from ..config import GradConfig

        run = make_memetic_run_block(
            obj, ga, gnm, GradConfig(lr=memetic_lr),
            refine_every=memetic_every, refine_steps=memetic_steps,
            sig_max=sig_max, sig_min=sig_min,
        )
    else:
        run = make_run_block(obj, ga, gnm, sig_max, sig_min)

    pad = len(str(ga.generations))
    if save_video and start_gen == 0:
        io_mod.save_frame_png(
            0, state.best, pad, prefix, video_dir, H, W, obj.k_sigma, save_video, impl=obj.impl
        )

    pbar = None
    if progress:
        try:
            from tqdm.auto import tqdm

            pbar = tqdm(total=ga.generations, initial=start_gen, desc="GA generations")
        except Exception:
            pbar = None

    cur_sigma = 0.0
    cur_target = target
    if anneal_sigma0 > 0.0:
        assert n_islands == 1, "scale-space annealing is single-deme only"
        from ..ops import anneal as anneal_mod

        _radius = anneal_mod.default_radius(anneal_sigma0)
        _blur_target = jax.jit(
            lambda t, s: anneal_mod.blur_image(t, s, _radius)
        )

        @jax.jit
        def _rescore(st: GAState, tgt, wm, sigma):
            # sigma stepped: re-score the population and the tracked best
            # on the NEW landscape so elites' stored fits and the monotone
            # best tracking stay commensurate with this block's energies.
            popb = anneal_mod.blur_genome_axes(st.pop, sigma)
            fits = objective_mod.evaluate(obj, popb, tgt, wm)
            bb = anneal_mod.blur_genome_axes(st.best[None], sigma)
            bf = objective_mod.evaluate(obj, bb, tgt, wm)[0]
            return st._replace(
                fits=fits, best_fit=bf, no_improve=st.no_improve * 0
            )

        @jax.jit
        def _rescore0(st: GAState, tgt, wm):
            fits = objective_mod.evaluate(obj, st.pop, tgt, wm)
            bf = objective_mod.evaluate(obj, st.best[None], tgt, wm)[0]
            return st._replace(
                fits=fits, best_fit=bf, no_improve=st.no_improve * 0
            )

    gen = start_gen
    last_frame_bucket = gen // max(1, frame_every)
    profiled = not profile_dir
    gens_per_s = 0.0
    # Frames can only be snapshotted between scan blocks, so honor a frame
    # cadence finer than the logging cadence by shrinking the block (the
    # reference saves mid-loop at exactly frame_every, algorithm.py:158).
    block_size = min(log_every, frame_every) if save_video else log_every
    if recycle_every and recycle_k:
        # The recycle trigger below fires at most once per block: honor a
        # cadence finer than the logging cadence by shrinking the block.
        block_size = min(block_size, recycle_every)
    block_size = max(1, block_size)
    try:
        while gen < ga.generations:
            block = min(block_size, ga.generations - gen)
            if anneal_sigma0 > 0.0:
                s = anneal_mod.sigma_schedule(
                    gen, ga.generations, anneal_sigma0, anneal_frac
                )
                if s != cur_sigma:
                    cur_target = _blur_target(target, jnp.float32(s)) if s > 0.0 else target
                    state = (
                        _rescore(state, cur_target, weight_mask, jnp.float32(s))
                        if s > 0.0
                        else _rescore0(state, cur_target, weight_mask)
                    )
                    cur_sigma = s
            run_args = (jnp.float32(cur_sigma),) if cur_sigma > 0.0 else ()
            t_block = time_mod.perf_counter()
            if not profiled and gen > start_gen:  # skip the compile block
                profiled = True
                with profiling.trace(profile_dir):
                    state, metrics = run(state, cur_target, weight_mask, block, *run_args)
                    jax.block_until_ready(metrics)
            else:
                state, metrics = run(state, cur_target, weight_mask, block, *run_args)
            # [block, 4]: best/mean/median + the stall counter (col 3) —
            # ONE readback per block serves curves, triggers, and the
            # progress bar (each extra device_get costs ~25 ms on the
            # async axon runtime).
            metrics = np.asarray(jax.device_get(metrics))
            gens_per_s = block / max(1e-9, time_mod.perf_counter() - t_block)
            curves["best"].extend(metrics[:, 0].tolist())
            curves["mean"].extend(metrics[:, 1].tolist())
            curves["median"].extend(metrics[:, 2].tolist())
            no_improve_now = int(metrics[-1, 3])
            gen += block

            if save_video:
                bucket = gen // max(1, frame_every)
                if bucket > last_frame_bucket:
                    last_frame_bucket = bucket
                    io_mod.save_frame_png(
                        gen, state.best, pad, prefix, video_dir, H, W, obj.k_sigma,
                        save_video, impl=obj.impl,
                    )
            # Recycle on a fixed cadence (recycle_every) and/or when the
            # best fitness has stalled for recycle_patience generations
            # (the no_improve counter is maintained on device by the
            # generation step; a stall-triggered recycle resets it so the
            # trigger re-arms).
            periodic = (
                recycle_every and recycle_k
                and gen % recycle_every < block and gen < ga.generations
            )
            stalled = (
                recycle_patience and recycle_k and gen < ga.generations
                and no_improve_now >= recycle_patience
            )
            if periodic or stalled:
                from . import grow as grow_mod

                k_r = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5EED), gen)
                # Under annealing, place and score against the CURRENT
                # (blurred) landscape so the refreshed fits stay
                # commensurate with the block's energies.
                new_pop = grow_mod.recycle_population(
                    k_r, state.pop, recycle_k, cur_target, obj, weight_mask
                )
                eval_pop = new_pop
                if cur_sigma > 0.0:
                    from ..ops import anneal as anneal_mod2

                    eval_pop = anneal_mod2.blur_genome_axes(
                        new_pop, jnp.float32(cur_sigma)
                    )
                new_fits = objective_mod.evaluate(obj, eval_pop, cur_target, weight_mask)
                if mesh is not None:
                    from ..parallel import mesh as mesh_mod2

                    new_pop = jax.device_put(new_pop, mesh_mod2.pop_sharding(mesh))
                    new_fits = jax.device_put(
                        new_fits,
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec(mesh_mod2.POP_AXIS)
                        ),
                    )
                state = state._replace(pop=new_pop, fits=new_fits)
                if stalled:
                    state = state._replace(no_improve=state.no_improve * 0)
                    no_improve_now = 0
            if checkpoint_path and checkpoint_every and gen % checkpoint_every < block:
                ckpt_mod.save_checkpoint(
                    checkpoint_path, state, meta={"gen": gen, "curves": curves}
                )
            if pbar is not None:
                f = float(genome_mod.anneal_factor(gen, ga.generations, ga.schedule))
                pbar.update(block)
                # postfix values come from the already-fetched metrics, not
                # from state fields (each of those is another device sync)
                pbar.set_postfix(
                    best_mse=f"{metrics[-1, 0]:.6f}",
                    stale=no_improve_now,
                    sigma_fac=f"{f:.3f}",
                    gens_s=f"{gens_per_s:.1f}",
                )
            # Stall-triggered stage end (--grow-auto): the generation step
            # already tracks no_improve on device; a stage that hasn't
            # improved its best for `stall_patience` generations ends so
            # the caller can grow capacity instead of burning budget.
            # (A stall-triggered recycle above resets the counter, so when
            # both are set use recycle_patience < stall_patience: the run
            # recycles first and only ends the stage if stalls persist
            # through the recycles.)
            if stall_patience and no_improve_now >= stall_patience:
                break
    except KeyboardInterrupt:
        print("\n[Interrupted] Returning current best individual…", flush=True)
    finally:
        if pbar is not None:
            pbar.close()

    try:
        curves_mod.save_loss_curve_png(
            curves, loss_png_path, title=f"{prefix} fitness", xlabel="Generation",
            ylabel="MSE", log_y=loss_log_y,
        )
        curves_mod.save_curves_csv(curves, loss_csv_path)
    except Exception as e:  # pragma: no cover
        print(f"[warn] Could not save loss curves: {e}")

    io_mod.flush_frames()
    best = np.asarray(jax.device_get(state.best))
    if return_state:
        # final population for stage chaining (progressive fitting)
        return best, float(state.best_fit), curves, np.asarray(jax.device_get(state.pop))
    return best, float(state.best_fit), curves
