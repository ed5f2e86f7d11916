"""GA-quality A/B for the fast-mode cull ε (docs/DESIGN.md §8c).

Runs the default-config GA (pop 32 x 512 splats -> synthetic 512²) for a
fixed budget under one evaluation setting — `--precision highest` or
`--precision fast` at the given cull ε (default DEFAULT_CULL_EPS) — across
several seeds IN ONE PROCESS (fresh compile-heavy processes degrade the
axon tunnel; see CLAUDE.md), then rescores every final genome with the
EXACT objective so the comparison is on one energy scale regardless of
the evaluation mode's bias.

Usage:
  python benchmarks/cull_ab.py --precision highest
  python benchmarks/cull_ab.py --precision fast --cull-eps 5e-2
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="fast", choices=["highest", "fast"])
    ap.add_argument(
        "--cull-eps", type=float, default=None,
        help="fast-mode cull ε (first-class Objective knob since round 3; "
        "default: render_pallas.DEFAULT_CULL_EPS)",
    )
    ap.add_argument("--gens", type=int, default=3000)
    ap.add_argument("--seeds", default="42,43,44")
    args = ap.parse_args()

    import jax.numpy as jnp

    from ggs_tpu.config import GAConfig, GenomeConfig, MaskConfig
    from ggs_tpu.models import ga
    from ggs_tpu.ops import objective
    from ggs_tpu.ops import render_pallas as rp
    from ggs_tpu.utils import io as io_mod

    H = W = 512
    target = io_mod.load_image("synthetic")
    obj_run = objective.Objective(
        H=H, W=W, impl="pallas", precision=args.precision,
        cull_eps=args.cull_eps,
    )
    obj_exact = objective.Objective(H=H, W=W, impl="pallas")
    ga_cfg = GAConfig(pop_size=32, generations=args.gens)
    gnm = GenomeConfig(n_splats=512)
    mask_cfg = MaskConfig(strength=0.7)

    finals = {}
    for seed in (int(s) for s in args.seeds.split(",")):
        best, _, _ = ga.genetic_approx(
            target, H, W, obj=obj_run, ga=ga_cfg, gnm=gnm, mask_cfg=mask_cfg,
            seed=seed, log_every=500, progress=False,
        )
        # Rescore on the exact energy (fast-mode fitness carries a ~eps-
        # scale bias; the A/B must compare on one scale).
        from ggs_tpu.ops import mask as mask_mod

        wm = mask_mod.compute_importance_mask(
            jnp.asarray(target), H, W, smooth=mask_cfg.smooth,
            strength=mask_cfg.strength,
        )
        f = objective.evaluate(obj_exact, best[None], jnp.asarray(target), wm)
        finals[seed] = float(f[0])

    vals = list(finals.values())
    print(json.dumps({
        "precision": args.precision,
        "cull_eps": (
            (rp.DEFAULT_CULL_EPS if args.cull_eps is None else args.cull_eps)
            if args.precision == "fast" else None
        ),
        "gens": args.gens,
        "exact_final_mse": {str(k): round(v, 6) for k, v in finals.items()},
        "mean": round(sum(vals) / len(vals), 6),
    }))


if __name__ == "__main__":
    main()
