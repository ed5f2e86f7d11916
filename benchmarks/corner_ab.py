"""Rect-min corner cull A/B (round 4; DESIGN §8c rejected-detour #1 re-land).

Measures, in ONE process (axon protocol: re-test a known-good graph
first, warm up at the timed length, one sync per timing):

  * exact-mode throughput (known-good tunnel-health canary),
  * for each ε in the ladder: fused fast-fitness renders/s and
    pairs/render with corner_cull OFF vs ON, plus the max |Δfitness|
    between the two (must sit inside the ε tolerance class).

Decision rule (VERDICT r3 item 2): ship corner_cull as the fast-mode
default if the ε=8e-2 headline gains materially (target ≥ ~10.5k r/s on
this v5e); otherwise record the measured negative in DESIGN §8c.

Usage: python benchmarks/corner_ab.py [--iters 50] [--eps 2e-3 8e-2]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--eps", type=float, nargs="+", default=[2e-3, 8e-2])
    ap.add_argument("--B", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec, mask as mask_mod, objective
    from ggs_tpu.ops import render_pallas as rp

    H = W = 512
    N = 512
    B = args.B
    iters = args.iters

    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)
    wm = mask_mod.compute_importance_mask(target, H, W, smooth=3, strength=0.7)
    pop0 = genome.new_population(jax.random.PRNGKey(0), B, N, H, W)

    def timed(obj):
        @jax.jit
        def ev(pop, _obj=obj):
            return objective.evaluate(_obj, pop, target, wm)

        out = ev(pop0)
        float(out.sum())  # compile+warmup sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = ev(pop0)
        f = out  # keep last
        s = float(f.sum())
        return (B * iters) / (time.perf_counter() - t0), ev

    # tunnel-health canary: the known-good exact graph first
    rps_exact, _ = timed(objective.Objective(H=H, W=W, impl="pallas"))
    print(json.dumps({"config": "exact-canary", "renders_per_s": round(rps_exact, 1)}),
          flush=True)

    n_tx, n_ty = -(-W // 128), -(-H // 64)

    for eps in args.eps:
        base = objective.Objective(H=H, W=W, impl="pallas", precision="fast",
                                   cull_eps=eps)
        row = {"cull_eps": eps}
        evs = {}
        # corner_cull defaults ON since round 4 — pin BOTH arms explicitly
        arms = (
            ("box", base._replace(corner_cull=False)),
            ("corner", base._replace(corner_cull=True)),
        )
        for label, obj in arms:
            rps, ev = timed(obj)
            evs[label] = ev
            row[f"renders_per_s_{label}"] = round(rps, 1)

            @jax.jit
            def pairs_fn(pop, _eps=eps, _corner=(label == "corner")):
                g9 = codec.genome_to_renderer(pop)
                p = codec.preprocess(g9, H, W, 3.0)
                p = rp._tighten_boxes(p, 3.0, cull_eps=_eps)
                corner = rp._corner_params(p, _eps) if _corner else None
                _, cnt = rp._bin_splats(p=p, n_tx=n_tx, n_ty=n_ty,
                                        tile_h=64, tile_w=128, cap=N,
                                        corner=corner)
                return jnp.sum(cnt)

            row[f"pairs_per_render_{label}"] = round(float(pairs_fn(pop0)) / B, 1)
        d = jnp.max(jnp.abs(evs["corner"](pop0) - evs["box"](pop0)))
        row["max_abs_dfitness_corner_vs_box"] = float(d)
        row["speedup_corner"] = round(
            row["renders_per_s_corner"] / row["renders_per_s_box"], 4
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
