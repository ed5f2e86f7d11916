"""Exact-tier default A/B: `highest` (reference conservative box) vs
`exact-tight` (deterministic tight k-sigma box) — round 5, VERDICT r4
item 8's decision evidence.

Both tiers run the SAME bit-exact f32 walk; they differ only in the
k-sigma truncation box (DESIGN §8e): `highest` reproduces the
reference's over-tall hy = k(|l21|+|l22|) bound (modules/render.py:25 —
a quirk, up to √2 over-padded), `exact-tight` the true k·√cov_yy. Same
truncation CLASS, no ε argument, fewer (tile, splat) pairs. This A/B
runs the GA at equal generations with identical seeds under each tier
and rescores every final on the `highest` energy, so the row answers
the only question the promotion needs: does training on the tight-box
energy cost ANY final quality? (Throughput of the two tiers is already
tracked side-by-side by bench.py / suite.py.)

One process, both arms warmed before any timed wall (axon protocol).

Usage: python benchmarks/tier_ab.py [--gens 10000] [--seeds 42,43,44]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BLOCK = 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=10000)
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--families", default="synthetic,natural")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n-splats", type=int, default=512)
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax.numpy as jnp

    from ggs_tpu.config import GAConfig, GenomeConfig, MaskConfig
    from ggs_tpu.models import ga
    from ggs_tpu.ops import objective
    from ggs_tpu.utils import io as io_mod

    H = W = args.size
    seeds = [int(s) for s in args.seeds.split(",")]
    families = [f for f in args.families.split(",") if f]
    gnm = GenomeConfig(n_splats=args.n_splats)
    mask_cfg = MaskConfig(strength=0.7)
    obj_ref = objective.Objective(H=H, W=W, impl=args.impl)  # highest
    obj_tight = obj_ref._replace(precision="exact-tight")
    gens = max(_BLOCK, args.gens // _BLOCK * _BLOCK)

    targets = {f: io_mod.load_image(f"{f}:{H}x{W}") for f in families}
    rows = []

    # warm both arms' run blocks at the timed block length (axon protocol)
    for obj in (obj_ref, obj_tight):
        ga.genetic_approx(
            targets[families[0]], H, W, obj=obj,
            ga=GAConfig(pop_size=32, generations=_BLOCK),
            gnm=gnm, mask_cfg=mask_cfg, seed=0, log_every=_BLOCK,
            progress=False,
        )
    print("[tier_ab] warmup done", file=sys.stderr, flush=True)

    for family in families:
        tgt = targets[family]
        for label, obj in (("highest", obj_ref), ("exact-tight", obj_tight)):
            finals, walls = {}, []
            for seed in seeds:
                t0 = time.perf_counter()
                best, _, _ = ga.genetic_approx(
                    tgt, H, W, obj=obj,
                    ga=GAConfig(pop_size=32, generations=gens),
                    gnm=gnm, mask_cfg=mask_cfg, seed=seed, log_every=_BLOCK,
                    progress=False,
                )
                walls.append(time.perf_counter() - t0)
                f = objective.evaluate(
                    obj_ref, best[None], jnp.asarray(tgt), None
                )
                finals[str(seed)] = round(float(f[0]), 6)
            vals = list(finals.values())
            row = {
                "config": f"tier-ab-{family}",
                "arm": label,
                "gens": gens,
                "wall_s_per_seed": round(sum(walls) / len(walls), 1),
                "exact_final_mse": finals,
                "mean": round(sum(vals) / len(vals), 6),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
