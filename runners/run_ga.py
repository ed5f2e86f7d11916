"""GA entry point (reference run_ggs.py equivalent, with a real CLI).

Loads a target image, picks the working resolution, runs the jitted GA,
then exports the full-resolution render, loss curves, and video frames.

    python runners/run_ga.py --image imgs/reference.png --generations 5000
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", default="imgs/reference.png")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--work-max-side", type=int, default=512)
    p.add_argument("--n-splats", type=int, default=512)
    p.add_argument("--pop-size", type=int, default=32)
    p.add_argument("--generations", type=int, default=500_000)
    p.add_argument("--tour-k", type=int, default=2)
    p.add_argument("--elite-k", type=int, default=8)
    p.add_argument("--cxpb", type=float, default=0.05)
    p.add_argument("--mutpb", type=float, default=0.05)
    p.add_argument("--schedule", default="cosine", choices=["cosine", "linear", "exp"])
    p.add_argument("--k-sigma", type=float, default=3.0)
    p.add_argument("--mask-strength", type=float, default=0.7)
    p.add_argument("--boost-only", action="store_true")
    p.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument(
        "--precision", default="exact-tight",
        choices=["highest", "exact-tight", "fast", "bf16"],
        help="exact-tight (default): the deterministic exact f32 walk over "
        "the tight k-sigma box — no tolerance term, ~+10%%, GA quality "
        "identical to highest (benchmarks/tier_ab.py, DESIGN §8e); "
        "highest: the reference's conservative box (bit-exact vs the "
        "oracle — reproduction runs); fast: +selection-validated ε-cull "
        "(~5e-5 canvas error + the cull tail); bf16 is a tested mode, "
        "not faster",
    )
    p.add_argument(
        "--cull-eps", type=float, default=None,
        help="fast-mode splat-contribution cull threshold (DESIGN §8c): "
        "larger trims more (tile, splat) pairs — +32%% eval throughput at "
        "the recommended 8e-2 — at a proportionally larger canvas "
        "tolerance; 8e-2 is the largest value the 30k-gen GA A/B validated "
        "as selection-safe (1.2e-1 measurably degrades quality). "
        "Default: 2e-3",
    )
    p.add_argument("--metric", default="mse", choices=["mse", "ssim", "mix"])
    p.add_argument("--ssim-weight", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--video-len", type=int, default=10)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default="")
    p.add_argument("--eval-chunk", type=int, default=0, help="0 = whole population at once")
    p.add_argument("--pop-shards", type=int, default=1, help="mesh pop-axis size")
    p.add_argument("--tile-shards", type=int, default=1, help="mesh tile-axis size")
    p.add_argument(
        "--islands", type=int, default=1,
        help=">1: island-model GA (deme-local selection + ring migration). "
        "Situational: fewer per-generation collectives but measured +23%% "
        "equal-budget MSE at 16-candidate demes — keep demes >= 64 "
        "(benchmarks/island_ab.py, RESULTS_v5e.md)",
    )
    p.add_argument("--migrate-every", type=int, default=0)
    p.add_argument("--migrate-k", type=int, default=1)
    p.add_argument("--profile-dir", default="", help="capture a jax.profiler trace here")
    p.add_argument("--recycle-every", type=int, default=0,
        help="every N generations, replace each candidate's k lowest-impact "
        "splats with error-guided ones (fixed N, no recompile)")
    p.add_argument("--recycle-k", type=int, default=0)
    p.add_argument(
        "--recycle-patience", type=int, default=0,
        help="also recycle whenever the best fitness stalls this many "
        "generations (0 = periodic-only; composes with --recycle-every)",
    )
    p.add_argument(
        "--anneal-sigma0", type=float, default=0.0,
        help="scale-space annealing (continuous coarse-to-fine at fixed "
        "canvas, zero recompiles): evaluate against a sigma-blurred target "
        "with sigma-blurred candidates, sigma decaying from this value to "
        "0 over the first --anneal-frac of the budget (ops/anneal.py)",
    )
    p.add_argument("--anneal-frac", type=float, default=0.6)
    p.add_argument(
        "--memetic-every", type=int, default=0,
        help="hybrid GA+SGD (BASELINE memetic config): every N generations "
        "give the elites --memetic-steps Lamarckian Adam steps through the "
        "differentiable renderer, accepted only when improved on the GA's "
        "own energy (0 = off; single-deme only, exclusive with annealing)",
    )
    p.add_argument("--memetic-steps", type=int, default=5)
    p.add_argument("--memetic-lr", type=float, default=1e-2)
    p.add_argument(
        "--grow-stages", type=int, default=1,
        help=">1: error-guided splat growth — stage i fits n-splats/2^(S-1-i) "
        "splats, then appends new splats at each candidate's own highest-"
        "residual pixels (models/grow.py), up to --n-splats in the final stage",
    )
    p.add_argument(
        "--grow-auto", action="store_true",
        help="stall-triggered growth: start at n-splats/8 and double the "
        "budget whenever the best fitness stalls for --grow-patience "
        "generations, instead of --grow-stages' fixed schedule. Uses the "
        "on-device no_improve counter; remaining --generations go to the "
        "full-size final stage",
    )
    p.add_argument(
        "--grow-patience", type=int, default=1500,
        help="generations without best-fitness improvement that end a "
        "grow-auto stage",
    )
    p.add_argument(
        "--fixed-mask", action="store_true",
        help="with --progressive: compute the importance mask ONCE at the "
        "final resolution and bilinearly downsample it for each stage, so "
        "all stages share one fitness landscape (the round-1 negative "
        "result blamed per-stage mask changes; docs/DESIGN.md 9)",
    )
    p.add_argument(
        "--progressive", default="",
        help="comma-separated work sides for coarse-to-fine stages, e.g. "
        "'128,256,512' (overrides --work-max-side; --generations split "
        "equally; the evolved population is rescaled between stages). "
        "Measured slower-to-quality than flat fitting at equal budgets "
        "(docs/DESIGN.md §9) — mainly useful as a resolution-upscale "
        "warm start",
    )
    return p


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.progressive and (args.grow_stages > 1 or args.grow_auto):
        parser.error("--progressive and --grow-stages/--grow-auto are mutually "
                     "exclusive; run progressive first, then a grow run "
                     "warm-started from its genome (--resume / pipeline)")
    if args.grow_auto and args.grow_stages > 1:
        parser.error("--grow-auto replaces --grow-stages' fixed schedule; "
                     "pass only one of them")

    from ggs_tpu.config import GAConfig, GenomeConfig, MaskConfig
    from ggs_tpu.models import ga
    from ggs_tpu.ops import codec, render
    from ggs_tpu.ops.objective import Objective
    from ggs_tpu.utils import io as io_mod

    os.makedirs(args.output_dir, exist_ok=True)
    video_dir = os.path.join(args.output_dir, "video_frames")
    save_video = not args.no_video
    if save_video:
        os.makedirs(video_dir, exist_ok=True)

    target = io_mod.load_image(args.image)
    H_out, W_out = target.shape[0], target.shape[1]
    H, W = codec.choose_work_size(H_out, W_out, max_side=args.work_max_side)
    print(f"target {H_out}x{W_out} -> work {H}x{W}")

    obj = Objective(
        H=H,
        W=W,
        k_sigma=args.k_sigma,
        boost_only=args.boost_only,
        impl=args.impl,
        chunk=args.eval_chunk or None,
        metric=args.metric,
        ssim_weight=args.ssim_weight,
        precision=args.precision,
        cull_eps=args.cull_eps,
    )
    ga_cfg = GAConfig(
        pop_size=args.pop_size,
        generations=args.generations,
        tour_k=args.tour_k,
        elite_k=args.elite_k,
        cxpb=args.cxpb,
        mutpb=args.mutpb,
        schedule=args.schedule,
    )
    gnm = GenomeConfig(n_splats=args.n_splats)
    mask_cfg = MaskConfig(strength=args.mask_strength, boost_only=args.boost_only)
    frame_every = max(1, args.generations // (args.fps * args.video_len))

    mesh = None
    if args.pop_shards * args.tile_shards > 1:
        from ggs_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(args.pop_shards, args.tile_shards)
        print(f"mesh: pop={args.pop_shards} x tile={args.tile_shards}")

    def run_stage(Hs, Ws, stage_cfg, init_pop, last, tag, gnm_s=None, patience=0,
                  weight_mask=None):
        return ga.genetic_approx(
            target,
            Hs,
            Ws,
            obj=obj._replace(H=Hs, W=Ws),
            ga=stage_cfg,
            gnm=gnm_s or gnm,
            mask_cfg=mask_cfg,
            seed=args.seed,
            log_every=args.log_every,
            save_video=save_video and last,
            frame_every=frame_every,
            video_dir=video_dir,
            prefix="ga",
            loss_png_path=os.path.join(args.output_dir, f"ga_loss{tag}.png"),
            loss_csv_path=os.path.join(args.output_dir, f"ga_loss{tag}.csv"),
            loss_log_y=True,
            checkpoint_path=os.path.join(args.output_dir, "ga_ckpt.npz") if last else "",
            checkpoint_every=args.checkpoint_every if last else 0,
            resume_from=args.resume if last else "",
            mesh=mesh,
            n_islands=args.islands,
            migrate_every=args.migrate_every,
            migrate_k=args.migrate_k,
            profile_dir=args.profile_dir if last else "",
            init_pop=init_pop,
            return_state=not last,
            recycle_every=args.recycle_every,
            recycle_k=args.recycle_k,
            recycle_patience=args.recycle_patience,
            stall_patience=patience,
            weight_mask=weight_mask,
            anneal_sigma0=args.anneal_sigma0 if last else 0.0,
            anneal_frac=args.anneal_frac,
            memetic_every=args.memetic_every,
            memetic_steps=args.memetic_steps,
            memetic_lr=args.memetic_lr,
        )

    if args.progressive:
        # Coarse-to-fine: most generations run on tiny canvases (a 128^2
        # stage evaluates 16x fewer pixels than 512^2), and the evolved
        # population carries over via the reference's anisotropic rescale
        # (modules/resize.py:16-20) into each finer stage.
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        stages = [int(s) for s in args.progressive.split(",") if s]
        gens_per = max(1, args.generations // len(stages))
        base_mask = None
        if args.fixed_mask:
            import jax
            from ggs_tpu.ops import mask as mask_mod
            from ggs_tpu.utils import io as io_mod2

            Hf, Wf = codec.choose_work_size(H_out, W_out, max_side=stages[-1])
            t_final = io_mod2.ensure_hw(jnp.asarray(target), Hf, Wf)
            base_mask = mask_mod.compute_importance_mask(
                t_final, Hf, Wf, smooth=mask_cfg.smooth, strength=mask_cfg.strength
            )
        pop0 = None
        prev = None
        for i, side in enumerate(stages):
            Hs, Ws = codec.choose_work_size(H_out, W_out, max_side=side)
            if pop0 is not None and (Hs, Ws) != prev:
                pop0 = np.asarray(
                    codec.scale_genome_pixels_anisotropic(
                        jnp.asarray(pop0), sH=Hs / prev[0], sW=Ws / prev[1]
                    )
                )
            last = i == len(stages) - 1
            stage_cfg = dataclasses.replace(ga_cfg, generations=gens_per)
            wm_s = None
            if base_mask is not None:
                import jax

                wm_s = jax.image.resize(
                    base_mask, (Hs, Ws), method="bilinear",
                    precision=jax.lax.Precision.HIGHEST,
                )
            out = run_stage(
                Hs, Ws, stage_cfg, pop0, last, "" if last else f"_s{i}",
                weight_mask=wm_s,
            )
            if last:
                best, best_fit, _ = out
            else:
                _, stage_fit, _, pop0 = out
                prev = (Hs, Ws)
                print(f"stage {i} ({Hs}x{Ws}): best MSE {stage_fit:.6f}")
        H, W = Hs, Ws
    elif args.grow_auto:
        # Stall-triggered growth (VERDICT round-1 item): no hand-tuned
        # stage schedule — each stage runs until the on-device no_improve
        # counter says the best fitness has stalled for --grow-patience
        # generations, then the budget doubles via error-guided growth
        # (models/grow.py) until --n-splats; whatever generations remain
        # fund the full-size final stage.
        import dataclasses

        import jax
        import jax.numpy as jnp

        from ggs_tpu.config import GenomeConfig
        from ggs_tpu.models import grow
        from ggs_tpu.ops import mask as mask_mod
        from ggs_tpu.utils import io as io_mod2

        t_work = io_mod2.ensure_hw(jnp.asarray(target), H, W)
        wm = mask_mod.compute_importance_mask(
            t_work, H, W, smooth=mask_cfg.smooth, strength=mask_cfg.strength
        )
        key = jax.random.PRNGKey(args.seed + 101)
        n_i = max(8, args.n_splats // 8)
        gens_left = args.generations
        pop0 = None
        stage = 0
        while True:
            last = n_i >= args.n_splats
            # A growth stage ends on stall OR at half the remaining budget,
            # whichever comes first — the final full-size stage (the one
            # with the most parameters to settle) always keeps at least
            # half of whatever is left.
            stage_gens = max(1, gens_left if last else gens_left // 2)
            stage_cfg = dataclasses.replace(ga_cfg, generations=stage_gens)
            out = run_stage(
                H, W, stage_cfg, pop0, last, "" if last else f"_a{stage}",
                GenomeConfig(n_splats=n_i), patience=0 if last else args.grow_patience,
            )
            if last:
                best, best_fit, _ = out
                break
            _, stage_fit, curves_s, pop0 = out
            # curves include the gen-0 init entry; generations RUN is one less
            used = max(1, len(curves_s["best"]) - 1)
            gens_left = max(1, gens_left - used)
            n_next = min(2 * n_i, args.n_splats)
            print(
                f"grow-auto stage {stage} (N={n_i}): best {stage_fit:.6f} "
                f"after {used} gens -> growing to {n_next}"
            )
            key, k_g = jax.random.split(key)
            pop0 = grow.grow_population(
                k_g, jnp.asarray(pop0), n_next - n_i, t_work, obj, weight_mask=wm
            )
            n_i = n_next
            stage += 1
    elif args.grow_stages > 1:
        # Error-guided splat growth (models/grow.py): fit small budgets
        # first, then append splats where each candidate's residual is
        # worst. Same stage chaining as --progressive; the canvas stays at
        # the working resolution throughout.
        import dataclasses

        import jax
        import jax.numpy as jnp

        from ggs_tpu.config import GenomeConfig
        from ggs_tpu.models import grow
        from ggs_tpu.ops import mask as mask_mod
        from ggs_tpu.utils import io as io_mod2

        S = args.grow_stages
        sizes = [max(8, args.n_splats // (2 ** (S - 1 - i))) for i in range(S)]
        sizes[-1] = args.n_splats
        # Budget per stage proportional to its splat count (equal
        # optimization effort per splat): equal splits starve the final
        # full-N stage, which has the most parameters to settle.
        total_n = sum(sizes)
        gens_stage = [max(1, args.generations * n // total_n) for n in sizes]
        t_work = io_mod2.ensure_hw(jnp.asarray(target), H, W)
        wm = mask_mod.compute_importance_mask(
            t_work, H, W, smooth=mask_cfg.smooth, strength=mask_cfg.strength
        )
        key = jax.random.PRNGKey(args.seed + 101)
        pop0 = None
        for i, n_i in enumerate(sizes):
            last = i == S - 1
            stage_cfg = dataclasses.replace(ga_cfg, generations=gens_stage[i])
            gnm_s = GenomeConfig(n_splats=n_i)
            out = run_stage(H, W, stage_cfg, pop0, last, "" if last else f"_g{i}", gnm_s)
            if last:
                best, best_fit, _ = out
            else:
                _, stage_fit, _, pop0 = out
                print(f"grow stage {i} (N={n_i}): best MSE {stage_fit:.6f}")
                key, k_g = jax.random.split(key)
                pop0 = grow.grow_population(
                    k_g, jnp.asarray(pop0), sizes[i + 1] - n_i, t_work,
                    obj, weight_mask=wm,
                )
    else:
        best, best_fit, _ = run_stage(H, W, ga_cfg, None, True, "")
    label = "MSE" if args.metric == "mse" else f"energy ({args.metric})"
    if args.precision != "highest":
        # The run's fitness carries the evaluation mode's bias (~5e-5 exp2
        # walk + the cull-ε tail, DESIGN §8c) — rescore the winner on the
        # exact energy so the reported number is mode-independent.
        import jax.numpy as _jnp

        from ggs_tpu.ops import mask as _mask_mod, objective as _objective

        _wm = _mask_mod.compute_importance_mask(
            io_mod.ensure_hw(_jnp.asarray(target), H, W), H, W,
            smooth=mask_cfg.smooth, strength=mask_cfg.strength,
        )
        best_fit = float(
            _objective.evaluate(
                # H/W too: --progressive leaves obj at the ORIGINAL work
                # size while the winning genome lives at the final stage
                # size (H, W was rebound after the stage loop)
                obj._replace(H=H, W=W, precision="highest", cull_eps=None),
                _jnp.asarray(best)[None],
                io_mod.ensure_hw(_jnp.asarray(target), H, W),
                _wm,
            )[0]
        )
        print(f"Best {label} (exact rescore):", best_fit)
    else:
        print(f"Best {label}:", best_fit)
    if best_fit > 0 and args.metric == "mse":
        import math

        print(f"PSNR: {-10.0 * math.log10(best_fit):.2f} dB")

    # Full-resolution export (run_ggs.py:64-77): rescale the genome, render once
    import jax.numpy as jnp
    import numpy as np

    sH, sW = H_out / float(H), W_out / float(W)
    best_full = codec.scale_genome_pixels_anisotropic(jnp.asarray(best), sH=sH, sW=sW)
    g9 = codec.genome_to_renderer(best_full)
    final = render.render_splats(g9[None], H_out, W_out, k_sigma=args.k_sigma, impl=args.impl)[0]
    out_path = os.path.join(args.output_dir, "ga_splats.png")
    io_mod.save_image_u8(final, out_path)
    # Save the genome itself, not just pixels (the reference only ever
    # saved a rendered PNG, run_ggs.py:69-77 — losing the parameters):
    # reload with np.load for full-res re-render or warm starts.
    np.save(os.path.join(args.output_dir, "ga_best_genome.npy"), np.asarray(best))
    print(f"Saved full resolution result as {out_path}")

    if save_video:
        anim = io_mod.assemble_apng(
            video_dir, "ga", os.path.join(args.output_dir, "ga_anim.apng"), fps=args.fps
        )
        if anim:
            print(f"Assembled animation: {anim}")


if __name__ == "__main__":
    main()
