"""Multi-chip scaling benchmark (BASELINE.md: >=90% efficiency at 2 hosts).

Measures the fused-sharded evaluator's throughput on (pop, tile) meshes of
growing device count and reports efficiency vs the single-device run:

    eff(n) = throughput(n) / (n * throughput(1))

On this development box only one real TPU chip is attached, so the sweep
degenerates to n=1 (the harness is ready for a real slice: it meshes over
however many devices `jax.devices()` reports; multi-host runs bootstrap
via ggs_tpu.parallel.mesh.init_distributed first). Candidates shard over
`pop`; pass --tile-shards to split canvas rows as well (the fitness
partials then psum over the tile axis, exercising the ICI collective
path).

    python benchmarks/scaling.py --n 512 --hw 512 --pop 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=512, help="splats")
    ap.add_argument("--hw", type=int, default=512, help="canvas side")
    ap.add_argument("--pop", type=int, default=256, help="candidates per eval")
    ap.add_argument("--tile-shards", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import objective
    from ggs_tpu.parallel import mesh as mesh_mod
    from ggs_tpu.parallel import shard

    if os.environ.get("GGS_SCALING_CPU"):
        # The axon TPU plugin ignores JAX_PLATFORMS; pin CPU explicitly to
        # demo the sweep mechanics on a virtual mesh (not a perf number).
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        devs = jax.devices("cpu")
    else:
        devs = jax.devices()
    H = W = args.hw
    key = jax.random.PRNGKey(0)
    pop = genome.new_population(key, args.pop, args.n, H, W)
    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), jnp.float32)

    def measure(n_dev: int) -> float:
        ts = args.tile_shards if n_dev % args.tile_shards == 0 else 1
        ps = n_dev // ts
        if os.environ.get("GGS_SCALING_CPU"):
            obj = objective.Objective(H=H, W=W, impl="pallas", interpret=True)
        else:
            obj = objective.Objective(H=H, W=W, impl="auto")
        if n_dev > 1:
            m = mesh_mod.make_mesh(ps, ts, devs[:n_dev])
            obj = shard.sharded_objective(obj, m)
            pop_d = jax.device_put(pop, mesh_mod.pop_sharding(m))
            tgt_d = shard.place_target(target, m)
        else:
            pop_d, tgt_d = pop, target
        fn = jax.jit(lambda p, t: objective.evaluate(obj, p, t, None))
        float(jnp.asarray(fn(pop_d, tgt_d)).sum())  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(pop_d, tgt_d)
        float(jnp.asarray(out).sum())
        return args.pop * args.iters / (time.perf_counter() - t0)

    sizes = []
    n = 1
    while n <= len(devs):
        sizes.append(n)
        n *= 2
    base = None
    for n_dev in sizes:
        if args.pop % n_dev != 0:
            continue
        thr = measure(n_dev)
        base = thr if base is None else base
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "renders_per_s": round(thr, 1),
                    "efficiency_vs_1": round(thr / (n_dev * base), 4),
                    "shape": f"pop={args.pop} N={args.n} {H}x{W}",
                }
            )
        )


if __name__ == "__main__":
    main()
