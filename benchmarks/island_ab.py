"""Island-model GA vs GSPMD global selection: the measured justification
(round 4; VERDICT r3 item 5 — the layer was correctness-tested only).

The island layer's whole case is collective-traffic removal: global
tournament selection gathers parent genomes across pop shards every
generation, while deme-local selection compiles to block-local index
arithmetic with communication ONLY at ring migration. This harness
measures, on the 8-virtual-device CPU mesh (the only multi-device
surface this box has — relative collective counts transfer to real
slices, absolute gens/s do not):

  1. collective ops in the COMPILED HLO of one run block (all-gather /
     all-reduce / collective-permute / all-to-all), island vs global;
  2. gens/s of the compiled blocks on the same mesh;
  3. equal-budget quality: best exact MSE after --gens generations on
     the synthetic target, 3 seeds each (deme-local selection explores
     differently — the throughput win must not cost convergence).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python benchmarks/island_ab.py [--gens 2000] [--pop 64]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COLL = ("all-gather", "all-reduce", "collective-permute", "all-to-all")


def _collective_counts(hlo_text: str) -> dict:
    counts = {}
    for op in _COLL:
        # count op starts (e.g. "all-gather(" / "all-gather-start("),
        # not tuple-element mentions
        counts[op] = len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo_text))
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=2000)
    ap.add_argument("--pop", type=int, default=64)
    ap.add_argument("--n-splats", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--block", type=int, default=200)
    ap.add_argument("--migrate-every", type=int, default=50)
    ap.add_argument("--migrate-k", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ggs_tpu.config import GAConfig, GenomeConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import mask as mask_mod
    from ggs_tpu.ops import objective
    from ggs_tpu.parallel import island, mesh as mesh_mod, shard
    from ggs_tpu.utils import io as io_mod

    H = W = args.size
    P = args.pop
    devs = jax.devices("cpu")[:8]
    m = mesh_mod.make_mesh(4, 2, devs)
    n_islands = m.shape["pop"]

    target = jnp.asarray(io_mod.load_image(f"synthetic:{H}x{W}"))
    wm = mask_mod.compute_importance_mask(target, H, W, smooth=3, strength=0.7)
    obj = objective.Objective(H=H, W=W, impl="xla")
    obj_s = shard.sharded_objective(obj, m)
    cfg = GAConfig(pop_size=P, generations=args.gens)
    gnm = GenomeConfig(n_splats=args.n_splats)
    seeds = [int(s) for s in args.seeds.split(",")]

    def build(island_mode: bool):
        if island_mode:
            return island.make_run_block(
                obj_s, cfg, gnm, n_islands,
                migrate_every=args.migrate_every, migrate_k=args.migrate_k,
                mesh=m,
            )
        return ga.make_run_block(obj_s, cfg, gnm)

    def place(st):
        return shard.place_ga_state(st, m)

    target_s = shard.place_target(target, m)
    wm_s = shard.place_mask(wm, m)

    rows = []
    for label, island_mode in (("global", False), ("island", True)):
        run = build(island_mode)
        st0 = place(ga.init(jax.random.PRNGKey(0), obj_s, target, wm, cfg, gnm))

        # 1. compiled-HLO collective counts for one block
        lowered = run.lower(st0, target_s, wm_s, args.block)
        counts = _collective_counts(lowered.compile().as_text())

        # 2. gens/s (compile excluded; same-length warmup, one sync)
        st = place(ga.init(jax.random.PRNGKey(1), obj_s, target, wm, cfg, gnm))
        st, mtr = run(st, target_s, wm_s, args.block)
        float(jnp.asarray(mtr).sum())
        t0 = time.perf_counter()
        st, mtr = run(st, target_s, wm_s, args.block)
        float(jnp.asarray(mtr).sum())
        gens_s = args.block / (time.perf_counter() - t0)

        # 3. equal-budget quality, 3 seeds (per-generation collective
        # savings must not cost convergence at equal generations)
        finals = {}
        for seed in seeds:
            st = place(ga.init(jax.random.PRNGKey(seed), obj_s, target, wm, cfg, gnm))
            best_fit = None
            done = 0
            while done < args.gens:
                st, mtr = run(st, target_s, wm_s, args.block)
                done += args.block
                best_fit = float(jnp.asarray(mtr)[-1, 0])
            finals[str(seed)] = round(best_fit, 6)
        vals = list(finals.values())
        rows.append({
            "config": f"island-ab-{label}",
            "mesh": dict(m.shape),
            "collectives_per_block": counts,
            "block_gens": args.block,
            "gens_per_s_cpu_mesh": round(gens_s, 2),
            "equal_budget_best_mse": finals,
            "mean": round(sum(vals) / len(vals), 6),
        })
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
