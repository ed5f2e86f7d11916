"""Why the cull's advantage GROWS with convergence (DESIGN §8c).

The ε-cull speedup measured on random-init populations (~+32% at ε=8e-2)
understates its effect on evolved populations: optimization accumulates
low-alpha splats (subtle color corrections) and large soft splats whose
conservative reference AABBs cover many tiles, so the (tile, splat) pair
count — the walk's cost driver — rises as the GA converges, while the
tight ε-aware boxes cut it back. This tool quantifies that: it evolves a
population for --gens generations, then reports pairs/render for the
init and final populations under (a) the conservative reference boxes,
(b) tight boxes at the default ε=2e-3, (c) tight boxes at the
recommended ε=8e-2, plus the fraction of splats fully culled (α ≤ ε).

Usage: python benchmarks/converged_pairs.py [--gens 30000] [--seed 42]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cull-eps", type=float, default=8e-2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.config import GAConfig, GenomeConfig, MaskConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import codec, objective
    from ggs_tpu.ops import render_pallas as rp
    from ggs_tpu.utils import io as io_mod

    H = W = 512
    N = 512
    P = 32
    target = io_mod.load_image("synthetic")
    gnm = GenomeConfig(n_splats=N)

    def pair_stats(pop):
        g9 = codec.genome_to_renderer(jnp.asarray(pop))

        def count(tighten_eps):
            p = codec.preprocess(g9, H, W, 3.0)
            if tighten_eps is not None:
                p = rp._tighten_boxes(p, 3.0, cull_eps=tighten_eps)
            _, cnt = rp._bin_splats(p=p, n_tx=-(-W // 128), n_ty=-(-H // 64),
                                    tile_h=64, tile_w=128, cap=N)
            return float(jnp.sum(cnt)) / pop.shape[0]

        alpha = jnp.asarray(pop)[..., 7] / 255.0
        return {
            "pairs_conservative": round(count(None), 1),
            "pairs_tight_eps2e-3": round(count(2e-3), 1),
            f"pairs_tight_eps{args.cull_eps:g}": round(count(args.cull_eps), 1),
            "frac_alpha_below_eps": round(
                float(jnp.mean(alpha <= args.cull_eps)), 4
            ),
        }

    init_pop = genome.new_population(
        jax.random.PRNGKey(args.seed), P, N, H, W,
        gnm.min_scale, gnm.max_scale,
    )
    obj = objective.Objective(
        H=H, W=W, impl="pallas", precision="fast", cull_eps=args.cull_eps
    )
    out = ga.genetic_approx(
        target, H, W, obj=obj, ga=GAConfig(pop_size=P, generations=args.gens),
        gnm=gnm, mask_cfg=MaskConfig(strength=0.7), seed=args.seed,
        log_every=1000, progress=False, return_state=True,
    )
    final_pop = out[-1]

    print(json.dumps({
        "config": f"pop{P}x{N}@512^2 synthetic, {args.gens} gens fast@{args.cull_eps:g}",
        "init": pair_stats(init_pop),
        "final": pair_stats(jnp.asarray(final_pop)),
    }))


if __name__ == "__main__":
    main()
