"""Fast-mode cull-ε sweep: throughput vs selection fidelity.

The tight ε-aware AABB cull (docs/DESIGN.md §8c) truncates each splat at
the radius where its contribution α·exp(−r²/2) falls below ε
(Objective.cull_eps; default render_pallas.DEFAULT_CULL_EPS = 2e-3). Larger ε cuts more
(tile, splat) pairs — the quantity that sets the walk's µs/render floor —
at the cost of a larger canvas tolerance. This tool measures, for each ε
in the sweep (ONE process — ε is a first-class jit-static parameter since
round 3, so no per-process env bake is needed):

  * fused fast-fitness throughput (the bench.py protocol: one sync
    amortized over all iters, warmup at the timed shape),
  * pairs/render via the binning counts,
  * selection fidelity: across R random populations, (a) how many have
    ANY fast-vs-exact argsort deviation and (b) the largest EXACT-fitness
    gap ever inverted by fast scoring — the quantity that matters for
    evolution (near-tie swaps are invisible to selection).

Usage:
  python benchmarks/eps_sweep.py                 # default ε ladder
  GGS_SWEEP_EPS=2e-3,5e-2,1e-1 python benchmarks/eps_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec, mask as mask_mod, objective
    from ggs_tpu.ops import render_pallas as rp

    H = W = 512
    N = 512
    B = 256
    iters = int(os.environ.get("GGS_SWEEP_ITERS", "50"))
    rounds = int(os.environ.get("GGS_SWEEP_RANK_ROUNDS", "20"))
    eps_list = [
        float(e)
        for e in os.environ.get("GGS_SWEEP_EPS", "2e-3,2e-2,5e-2,8e-2,1.2e-1").split(",")
    ]

    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)
    wm = mask_mod.compute_importance_mask(target, H, W, smooth=3, strength=0.7)
    obj_exact = objective.Objective(H=H, W=W, impl="pallas")

    @jax.jit
    def ev_exact(pop):
        return objective.evaluate(obj_exact, pop, target, wm)

    pop0 = genome.new_population(jax.random.PRNGKey(0), B, N, H, W)
    # Rank-fidelity populations are shared across ε values; score the
    # exact side once.
    rank_pops = [
        genome.new_population(jax.random.PRNGKey(100 + r), 64, N, H, W)
        for r in range(rounds)
    ]
    rank_exact = [ev_exact(p) for p in rank_pops]

    for eps in eps_list:
        obj_fast = objective.Objective(
            H=H, W=W, impl="pallas", precision="fast", cull_eps=eps
        )

        @jax.jit
        def ev_fast(pop, _obj=obj_fast):
            return objective.evaluate(_obj, pop, target, wm)

        # Throughput (fast fused).
        float(ev_fast(pop0).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = ev_fast(pop0)
        float(out.sum())
        rps = (B * iters) / (time.perf_counter() - t0)

        # Pairs/render under this ε (tight boxes feed binning directly).
        @jax.jit
        def pairs_fn(pop, _eps=eps):
            g9 = codec.genome_to_renderer(pop)
            p = codec.preprocess(g9, H, W, 3.0)
            p = rp._tighten_boxes(p, 3.0, cull_eps=_eps)
            _, cnt = rp._bin_splats(p=p, n_tx=-(-W // 128), n_ty=-(-H // 64),
                                    tile_h=64, tile_w=128, cap=N)
            return jnp.sum(cnt)

        pairs = float(pairs_fn(pop0)) / B

        # Selection fidelity fast vs exact over R pops. Random-init
        # populations cluster tightly in fitness, so bitwise argsort
        # equality is the wrong bar — adjacent swaps among near-ties are
        # invisible to selection. Report (a) pops with ANY argsort
        # deviation and (b) the largest EXACT-fitness gap ever inverted
        # (fast says a<b, exact says b<a): selection only steers wrong
        # when that gap is large relative to the fitness scale.
        mismatches = 0
        max_rankdev = 0
        max_inv_gap = 0.0
        for r in range(rounds):
            ff = ev_fast(rank_pops[r])
            fe = rank_exact[r]
            f = jnp.argsort(ff)
            e = jnp.argsort(fe)
            dev = int(jnp.sum(f != e))
            mismatches += int(dev > 0)
            max_rankdev = max(max_rankdev, dev)
            d_f = ff[:, None] - ff[None, :]
            d_e = fe[:, None] - fe[None, :]
            inverted = (d_f > 0) & (d_e < 0)
            gap = jnp.where(inverted, -d_e, 0.0) / jnp.mean(fe)
            max_inv_gap = max(max_inv_gap, float(jnp.max(gap)))

        print(
            json.dumps(
                {
                    "cull_eps": eps,
                    "renders_per_s_fast": round(rps, 1),
                    "pairs_per_render": round(pairs, 1),
                    "rank_mismatch_pops": mismatches,
                    "rank_rounds": rounds,
                    "max_rank_positions_off": max_rankdev,
                    "max_inverted_rel_gap": round(max_inv_gap, 8),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
