"""Equal-WALL-CLOCK GA quality A/B: exact selection vs fast @ the
recommended cull ε (docs/DESIGN.md §8c).

The equal-generation A/B (benchmarks/cull_ab.py) shows the fast mode's
selection decisions track exact's. The practical claim is stronger: at an
equal *time budget* the fast mode runs more generations. The measured
per-generation advantage at this config is ~1.74x (5.27 → 3.03 ms/gen) —
larger than the B=256 eval-throughput ratio because the GA's pop-32
batches amortize dispatch worse AND the fast walk's pair ratio holds on
evolved populations (converged pairs 3,025 conservative vs 1,849 tight
@ ε=8e-2, ~10% of splats fully α-culled — benchmarks/converged_pairs.py).
Pre-measuring a gens/s ratio on a fresh process risks tunnel-state
contamination (a degraded exact arm once read 9.1 ms/gen); this harness
instead matches wall clock by a two-pass protocol inside one process:

  1. EXACT arm: run --gens generations per seed, record the realized
     mean wall seconds — that is the time budget.
  2. FAST arm: probe one seed at --gens to get its realized wall time,
     scale the generation count to the budget (rounded to the jitted
     block length), then run every seed at that count and report the
     realized wall seconds next to the quality numbers (the honesty
     check: it should match the budget to ~10%).

Every final genome is rescored on the EXACT energy. Each
`ga.genetic_approx` call compiles its own run block (~8 s), included in
all wall times on both arms — it is part of the cost of a real run.
One process for everything (tunnel hygiene — see CLAUDE.md).

Usage:
  python benchmarks/equal_time_ab.py [--gens 30000] [--seeds 42,43,44]
         [--cull-eps 8e-2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BLOCK = 1000  # log_every: the jitted scan block length for every run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=30000)
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--cull-eps", type=float, default=8e-2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ggs_tpu.config import GAConfig, GenomeConfig, MaskConfig
    from ggs_tpu.models import ga
    from ggs_tpu.ops import mask as mask_mod
    from ggs_tpu.ops import objective
    from ggs_tpu.utils import io as io_mod

    H = W = 512
    target = io_mod.load_image("synthetic")
    gnm = GenomeConfig(n_splats=512)
    mask_cfg = MaskConfig(strength=0.7)
    obj_exact = objective.Objective(H=H, W=W, impl="pallas")
    obj_fast = obj_exact._replace(precision="fast", cull_eps=args.cull_eps)
    wm = mask_mod.compute_importance_mask(
        jnp.asarray(target), H, W, smooth=mask_cfg.smooth,
        strength=mask_cfg.strength,
    )
    seeds = [int(s) for s in args.seeds.split(",")]

    def run_ga(obj, gens, seed):
        t0 = time.perf_counter()
        best, _, _ = ga.genetic_approx(
            target, H, W, obj=obj, ga=GAConfig(pop_size=32, generations=gens),
            gnm=gnm, mask_cfg=mask_cfg, seed=seed, log_every=_BLOCK,
            progress=False,
        )
        wall = time.perf_counter() - t0
        f = objective.evaluate(obj_exact, best[None], jnp.asarray(target), wm)
        return round(float(f[0]), 6), wall

    def run_arm(obj, gens):
        finals, walls = {}, []
        for seed in seeds:
            mse, wall = run_ga(obj, gens, seed)
            finals[str(seed)] = mse
            walls.append(wall)
        vals = list(finals.values())
        return {
            "gens": gens,
            "wall_s_per_seed": round(sum(walls) / len(walls), 1),
            "exact_final_mse": finals,
            "mean": round(sum(vals) / len(vals), 6),
        }

    exact_arm = run_arm(obj_exact, args.gens)
    budget_s = exact_arm["wall_s_per_seed"]

    _, probe_wall = run_ga(obj_fast, args.gens, seeds[0])
    gens_fast = max(
        _BLOCK,
        int(round(args.gens * budget_s / probe_wall / _BLOCK)) * _BLOCK,
    )
    fast_arm = run_arm(obj_fast, gens_fast)

    print(json.dumps({
        "config": "equal-time-ab pop32x512@512^2 synthetic",
        "cull_eps": args.cull_eps,
        "budget_s": budget_s,
        "fast_probe_wall_s_at_exact_gens": round(probe_wall, 1),
        "highest": exact_arm,
        "fast": fast_arm,
    }))


if __name__ == "__main__":
    main()
