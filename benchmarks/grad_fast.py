"""Fast-mode (ε-culled) gradient path: throughput ladder + quality A/B.

Round-3 follow-up to DESIGN §8c: the forward evaluator's tight ε-aware
AABB cull, applied to the differentiable/fused loss+grad path
(render_grad.py cull_eps; models/gradient._grad_cull_eps). Measures, in
ONE process (axon gotchas: same-length warmup, one sync per timing,
batched measurements):

1. Adam steps/s at the grad-2k config (2000 splats @ 512², B=1, fused
   single-kernel loss+grad) for exact boxes vs fast @ ε ∈ {2e-3, 8e-2}.
2. Quality A/B: Adam from random init, `--steps` steps, 3 seeds per arm,
   every final genome rescored on the EXACT energy — the honest check
   that descending the culled surface (where sub-ε-alpha splats are
   frozen) does not cost converged quality.

Usage: python benchmarks/grad_fast.py [--steps 400] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400, help="quality-A/B Adam steps")
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--iters", type=int, default=100, help="throughput timing steps")
    ap.add_argument(
        "--image", default="",
        help="quality-A/B target image (work-sized to 512); default: uniform noise",
    )
    ap.add_argument("--skip-ladder", action="store_true")
    ap.add_argument(
        "--prefit", type=int, default=800,
        help="steps fitted before the converged-state throughput timing",
    )
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument(
        "--ab-eps", type=float, nargs="+", default=[2e-3, 8e-2],
        help="fast-mode ε arms (exact always runs)",
    )
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import genome, gradient
    from ggs_tpu.ops import objective

    H = W = 512
    N = 500 if args.quick else 2000
    iters = 20 if args.quick else args.iters
    steps = 100 if args.quick else args.steps
    gnm = GenomeConfig(n_splats=N)
    cfg = GradConfig(lr=1e-2)
    if args.image:
        from ggs_tpu.utils import io as io_mod

        tgt = io_mod.ensure_hw(jnp.asarray(io_mod.load_image(args.image)), H, W)
    else:
        tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))

    arms = [("exact", objective.Objective(H=H, W=W))]
    for eps in args.ab_eps:
        arms.append(
            (f"fast_eps{eps:g}",
             objective.Objective(H=H, W=W, precision="fast", cull_eps=eps))
        )

    # --- 1. throughput ladder (grad-2k protocol, benchmarks/suite.py) ---
    rows = []
    runs = {}
    for name, obj in arms:
        opt, _ = gradient.make_fit_step(obj, gnm, cfg)
        run = gradient.make_run_block(obj, gnm, cfg)
        runs[name] = (obj, opt, run)
        g0 = genome.new_population(jax.random.PRNGKey(0), 1, N, H, W)
        state = gradient.init_state(opt, g0)
        state, m = run(state, tgt, None, iters)  # compile at the timed length
        float(jnp.asarray(m).sum())  # sync (axon dispatches async)
        if args.skip_ladder:
            continue
        g0 = genome.new_population(jax.random.PRNGKey(0), 1, N, H, W)
        state = gradient.init_state(opt, g0)
        t0 = time.perf_counter()
        state, m = run(state, tgt, None, iters)
        float(jnp.asarray(m).sum())
        dt = (time.perf_counter() - t0) / iters
        # Converged-state throughput: pair counts FALL as fitting shrinks
        # splats (DESIGN §8c converged_pairs), so the culled advantage
        # grows over a run — time the same block again after `prefit`
        # further steps.
        done = iters
        while done < args.prefit:
            state, m = run(state, tgt, None, iters)
            done += iters
        float(jnp.asarray(m).sum())
        t0 = time.perf_counter()
        state, m = run(state, tgt, None, iters)
        float(jnp.asarray(m).sum())
        dtc = (time.perf_counter() - t0) / iters
        rows.append({
            "config": f"grad-2k-{name}",
            "adam_steps_per_s": round(1.0 / dt, 2),
            "adam_steps_per_s_converged": round(1.0 / dtc, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    # --- 2. quality A/B: exact-rescored final energy per arm ---
    if args.skip_ab:
        return
    exact_obj = arms[0][1]
    exact_loss = gradient.make_loss_fn(exact_obj, gnm)
    score = jax.jit(lambda g: exact_loss(g, tgt, None)[1])
    for name, _ in arms:
        obj, opt, run = runs[name]
        finals = []
        t0 = time.perf_counter()
        for seed in args.seeds:
            g0 = genome.new_population(jax.random.PRNGKey(seed), 1, N, H, W)
            state = gradient.init_state(opt, g0)
            # run in `iters`-sized blocks: reuses the compiled length above
            done = 0
            while done < steps:
                state, m = run(state, tgt, None, iters)
                done += iters
            finals.append(float(score(state.g)[0]))
        wall = time.perf_counter() - t0
        row = {
            "config": f"adam-ab-{name}",
            "steps": steps,
            "seeds": args.seeds,
            "final_exact_mse": [round(v, 6) for v in finals],
            "mean": round(sum(finals) / len(finals), 6),
            "wall_s": round(wall, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
