"""Standing multi-image QUALITY benchmark (round-4; VERDICT r3 item 1).

Throughput regressions are diffable round-over-round (suite.py rows);
this harness makes QUALITY regressions equally diffable, and widens the
evidence for the recommended evolution mode (`--precision fast
--cull-eps 8e-2`, DESIGN §8c) from one synthetic target to seven image
families with distinct spectral/structural character
(utils/io.quality_target: gradient / portrait / texture / text /
natural, plus the original synthetic, plus — round 5, VERDICT r4 item 1
— "natural" with numerically-pinned 1/f² statistics and "photo", the
bundled REAL photograph (a lossless crop of matplotlib's public-domain
grace_hopper sample; tests/test_io.py pins both). The old
imgs/reference.png is a u8-quantized crop of the synthetic target, not
an independent family, so it is not a separate row.

Arms, per family (all rescored on the EXACT energy, fixed seeds):
  ga          GA at equal GENERATIONS: exact vs fast @ --cull-eps.
  ga-time     GA at equal WALL-CLOCK: fast re-run with its generation
              count scaled so its realized wall matches the exact arm's
              (two-pass protocol of equal_time_ab.py, probe folded into
              the equal-gens fast arm).
  adam        Adam polish from random init (grad-2k protocol): exact vs
              fast @ each --adam-eps (selection ε ≠ polish ε — §8d).
  pipeline    the SHIPPED two-stage recipe (run_pipeline: grow-auto GA +
              Adam polish) at a reduced budget, exact vs fast GA stage,
              rescored from the saved genome. Opt-in (--arms pipeline).

One process for everything (axon tunnel hygiene — CLAUDE.md); every row
is one JSON line, also written to --out as a list for diffing.

Usage:
  python benchmarks/quality.py [--quick] [--out benchmarks/QUALITY_r04.json]
  python benchmarks/quality.py --arms ga --families text,texture
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = [
    "synthetic", "gradient", "portrait", "texture", "text", "natural", "photo",
]
_BLOCK = 1000  # jitted GA scan-block length for every run (one compile)


def _psnr(mse: float) -> float:
    return round(-10.0 * math.log10(max(mse, 1e-12)), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--gens", type=int, default=10000)
    ap.add_argument("--adam-steps", type=int, default=800)
    ap.add_argument("--adam-n", type=int, default=2000)
    ap.add_argument("--cull-eps", type=float, default=8e-2,
                    help="GA selection ε arm (the recommended evolution mode)")
    ap.add_argument("--adam-eps", type=float, nargs="+", default=[2e-3, 1e-2],
                    help="gradient-polish ε arms (quality-neutral band, §8d)")
    ap.add_argument("--arms", default="ga,ga-time,adam",
                    help="comma subset of ga,ga-time,adam,pipeline "
                    "(pipeline is opt-in: ~3-5 min/seed/arm on the v5e)")
    ap.add_argument("--pipeline-gens", type=int, default=20000,
                    help="pipeline-arm GA budget (reduced vs the 100k "
                    "flagship recipe; same two-stage structure)")
    ap.add_argument("--pipeline-adam-steps", type=int, default=400)
    ap.add_argument("--pipeline-n-splats", type=int, default=512)
    ap.add_argument("--pipeline-families", default="",
                    help="pipeline-arm families (default: every selected "
                    "family — round 5, VERDICT r4 item 6)")
    ap.add_argument("--impl", default="pallas",
                    help="renderer impl (xla: CPU protocol smoke-testing)")
    ap.add_argument("--size", type=int, default=512,
                    help="canvas size (smoke-testing only; rows are 512)")
    ap.add_argument("--n-splats", type=int, default=512,
                    help="GA-arm genome size (smoke-testing only)")
    ap.add_argument("--out", default="")
    ap.add_argument("--quick", action="store_true",
                    help="2 seeds, gens/4, adam-steps/2 (protocol smoke run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.config import GAConfig, GenomeConfig, GradConfig, MaskConfig
    from ggs_tpu.models import ga, genome, gradient
    from ggs_tpu.ops import mask as mask_mod
    from ggs_tpu.ops import objective
    from ggs_tpu.utils import io as io_mod

    seeds = [int(s) for s in args.seeds.split(",")]
    gens = args.gens
    adam_steps = args.adam_steps
    if args.quick:
        seeds = seeds[:2]
        gens = max(_BLOCK, gens // 4 // _BLOCK * _BLOCK)
        adam_steps = max(100, adam_steps // 2)
    families = [f for f in args.families.split(",") if f]
    arms = set(args.arms.split(","))

    H = W = args.size
    gnm = GenomeConfig(n_splats=args.n_splats)
    mask_cfg = MaskConfig(strength=0.7)
    obj_exact = objective.Objective(H=H, W=W, impl=args.impl)
    obj_fast = obj_exact._replace(precision="fast", cull_eps=args.cull_eps)
    targets = {f: io_mod.load_image(f"{f}:{H}x{W}") for f in families}
    wms = {
        f: mask_mod.compute_importance_mask(
            jnp.asarray(t), H, W, smooth=mask_cfg.smooth,
            strength=mask_cfg.strength,
        )
        for f, t in targets.items()
    }

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def run_ga_arm(family, obj, n_gens):
        """-> (per-seed exact MSE dict, mean wall s/seed)."""
        finals, walls = {}, []
        for seed in seeds:
            t0 = time.perf_counter()
            best, _, _ = ga.genetic_approx(
                targets[family], H, W, obj=obj,
                ga=GAConfig(pop_size=32, generations=n_gens),
                gnm=gnm, mask_cfg=mask_cfg, seed=seed, log_every=_BLOCK,
                progress=False,
            )
            walls.append(time.perf_counter() - t0)
            f = objective.evaluate(
                obj_exact, best[None], jnp.asarray(targets[family]), wms[family]
            )
            finals[str(seed)] = round(float(f[0]), 6)
        return finals, sum(walls) / len(walls)

    def ga_row(family, arm, mode_label, finals, n_gens, wall):
        vals = list(finals.values())
        mean = sum(vals) / len(vals)
        emit({
            "config": f"quality-{arm}-{family}",
            "arm": mode_label,
            "gens": n_gens,
            "wall_s_per_seed": round(wall, 1),
            "exact_final_mse": finals,
            "mean": round(mean, 6),
            "psnr_db": _psnr(mean),
        })
        return mean

    # ---- GA: equal generations, then equal wall-clock ----
    if "ga" in arms or "ga-time" in arms:
        # Warmup: compile both arms' run blocks AND absorb the axon
        # tunnel's first-execution wake-up BEFORE any timed wall —
        # equal-time budgets are computed from realized walls, so a
        # compile-contaminated exact arm would hand the fast arm a
        # bogus generation budget (seen in the protocol smoke: 245 s
        # for the first 1k-gen block vs 5 s steady-state).
        for obj in (obj_exact, obj_fast):
            ga.genetic_approx(
                targets[families[0]], H, W, obj=obj,
                ga=GAConfig(pop_size=32, generations=_BLOCK),
                gnm=gnm, mask_cfg=mask_cfg, seed=0, log_every=_BLOCK,
                progress=False,
            )
        print("[quality] GA warmup done", file=sys.stderr, flush=True)
        for family in families:
            ex_finals, ex_wall = run_ga_arm(family, obj_exact, gens)
            ga_row(family, "ga", "exact", ex_finals, gens, ex_wall)
            fa_finals, fa_wall = run_ga_arm(family, obj_fast, gens)
            ga_row(
                family, "ga", f"fast-eps{args.cull_eps:g}", fa_finals, gens, fa_wall
            )
            if "ga-time" not in arms:
                continue
            # equal wall-clock: the equal-gens fast arm doubles as the probe
            gens_ft = max(
                _BLOCK, int(round(gens * ex_wall / fa_wall / _BLOCK)) * _BLOCK
            )
            ft_finals, ft_wall = run_ga_arm(family, obj_fast, gens_ft)
            ga_row(
                family, "ga-time", f"fast-eps{args.cull_eps:g}", ft_finals,
                gens_ft, ft_wall,
            )

    # ---- Adam polish from random init (grad_fast.py §2 protocol) ----
    if "adam" in arms:
        N = args.adam_n
        gcfg = GradConfig(lr=1e-2)
        ggnm = GenomeConfig(n_splats=N)
        adam_arms = [("exact", obj_exact)] + [
            (f"fast-eps{e:g}",
             obj_exact._replace(precision="fast", cull_eps=e))
            for e in args.adam_eps
        ]
        block = 100
        # Build + warm each arm's run block ONCE (make_run_block returns a
        # fresh jitted closure — per-family rebuilds would recompile), and
        # one exact scorer shared by every family (target is an argument).
        exact_loss = gradient.make_loss_fn(obj_exact, ggnm)
        score = jax.jit(lambda g, t: exact_loss(g, t, None)[1])
        runs = {}
        warm_t = io_mod.ensure_hw(jnp.asarray(targets[families[0]]), H, W)
        for name, obj in adam_arms:
            opt, _ = gradient.make_fit_step(obj, ggnm, gcfg)
            run = gradient.make_run_block(obj, ggnm, gcfg)
            g0 = genome.new_population(jax.random.PRNGKey(0), 1, N, H, W)
            st, m = run(gradient.init_state(opt, g0), warm_t, None, block)
            float(jnp.asarray(m).sum())  # sync the warmup (axon async)
            runs[name] = (opt, run)
        print("[quality] Adam warmup done", file=sys.stderr, flush=True)
        for family in families:
            tgt = io_mod.ensure_hw(jnp.asarray(targets[family]), H, W)
            for name, obj in adam_arms:
                opt, run = runs[name]
                finals = []
                t0 = time.perf_counter()
                for seed in seeds:
                    g0 = genome.new_population(jax.random.PRNGKey(seed), 1, N, H, W)
                    state = gradient.init_state(opt, g0)
                    done = 0
                    while done < adam_steps:
                        state, m = run(state, tgt, None, block)
                        done += block
                    finals.append(round(float(score(state.g, tgt)[0]), 6))
                wall = time.perf_counter() - t0
                mean = sum(finals) / len(finals)
                emit({
                    "config": f"quality-adam-{family}",
                    "arm": name,
                    "steps": adam_steps,
                    "n_splats": N,
                    "wall_s_all_seeds": round(wall, 1),
                    "exact_final_mse": {
                        str(s): v for s, v in zip(seeds, finals)
                    },
                    "mean": round(mean, 6),
                    "psnr_db": _psnr(mean),
                })

    # ---- pipeline: the SHIPPED two-stage recipe (grow-auto GA + Adam
    # polish) through the real run_pipeline entry, in-process so the jit
    # caches carry across seeds/arms (dozens of fresh compile-heavy
    # processes is exactly the axon-tunnel degradation pattern —
    # CLAUDE.md). Wall decontamination (round 5, VERDICT r4 item 6): one
    # UNTIMED warmup pipeline run per arm absorbs every stage compile
    # (stage jit keys depend on shapes/flags, identical across families
    # and seeds), so every timed wall below is steady-state — the
    # equal-isolation property fresh processes would give, without the
    # tunnel risk. Reduced budget vs the 100k-gen flagship recipe;
    # rescored on the exact energy from the saved genome, so the row is
    # parse-free.
    if "pipeline" in arms:
        import shutil
        import tempfile

        import numpy as np

        from runners import run_pipeline

        pipe_fams = [f for f in args.pipeline_families.split(",") if f]
        pipe_fams = [f for f in pipe_fams if f in targets] or families
        pipe_arms = [
            # "exact" = the runners' DEFAULT exact tier (highest through
            # round 4; the deterministic exact-tight since the round-5
            # promotion, DESIGN §8e) — the shipped recipe as a user gets
            # it; rows stay comparable because every final is rescored on
            # the highest energy below.
            ("exact", []),
            (f"fast-eps{args.cull_eps:g}",
             ["--precision", "fast", "--cull-eps", str(args.cull_eps)]),
        ]
        for label, extra in pipe_arms:  # untimed compile-absorbing warmups
            outdir = tempfile.mkdtemp(prefix="qpipe-warm-")
            try:
                run_pipeline.main([
                    "--image", f"{pipe_fams[0]}:{H}x{W}",
                    "--output-dir", outdir,
                    "--n-splats", str(args.pipeline_n_splats),
                    "--ga-generations", str(args.pipeline_gens),
                    "--adam-steps", str(args.pipeline_adam_steps),
                    "--seed", "0", "--no-video",
                ] + extra)
            finally:
                shutil.rmtree(outdir, ignore_errors=True)
        print("[quality] pipeline warmup done", file=sys.stderr, flush=True)
        for family in pipe_fams:
            tgt = io_mod.ensure_hw(jnp.asarray(targets[family]), H, W)
            for label, extra in pipe_arms:
                finals = {}
                t0 = time.perf_counter()
                for seed in seeds:
                    outdir = tempfile.mkdtemp(prefix=f"qpipe-{family}-")
                    try:
                        run_pipeline.main([
                            "--image", f"{family}:{H}x{W}",
                            "--output-dir", outdir,
                            "--n-splats", str(args.pipeline_n_splats),
                            "--ga-generations", str(args.pipeline_gens),
                            "--adam-steps", str(args.pipeline_adam_steps),
                            "--seed", str(seed), "--no-video",
                        ] + extra)
                        g = jnp.asarray(
                            np.load(os.path.join(outdir, "grad_genome.npy"))
                        )
                        f = objective.evaluate(obj_exact, g[None], tgt, wms[family])
                        finals[str(seed)] = round(float(f[0]), 6)
                    finally:
                        shutil.rmtree(outdir, ignore_errors=True)
                wall = (time.perf_counter() - t0) / len(seeds)
                vals = list(finals.values())
                mean = sum(vals) / len(vals)
                emit({
                    "config": f"quality-pipeline-{family}",
                    "arm": label,
                    "ga_gens": args.pipeline_gens,
                    "adam_steps": args.pipeline_adam_steps,
                    "wall_s_per_seed": round(wall, 1),
                    "exact_final_mse": finals,
                    "mean": round(mean, 6),
                    "psnr_db": _psnr(mean),
                })

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[quality] wrote {len(rows)} rows to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
