"""Binning share of the large-canvas render step.

The pair-scatter binning (ops/render_pallas.py::_bin_splats_scatter,
docs/DESIGN.md §12) is the non-walk half of a >=256-tile render. This
tool times (a) the full render and (b) a binning-only graph with the
SAME chunk layout the render uses, and reports binning's share — the
round-2 verdict #3 "done" criterion is binning <= 15% of the 4k^2/50k
step. Protocol per docs/DESIGN.md §8b: warm up at the timed shapes,
amortize ONE readback over all iterations (an axon sync costs ~25 ms).

Usage: python benchmarks/binshare.py [--quick]  (quick: 20k @ 2048^2)
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
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec
    from ggs_tpu.ops import render_pallas as rp

    H = W = 2048 if args.quick else 4096
    N = 20_000 if args.quick else 50_000
    tile_h, tile_w = 64, 128
    n_tx, n_ty = -(-W // tile_w), -(-H // tile_h)

    g9 = codec.genome_to_renderer(
        genome.new_population(
            jax.random.PRNGKey(0), 1, N, H, W, min_scale=1.0, max_scale=0.02
        )
    )

    render = jax.jit(lambda g: rp.render_pallas(g, H, W))

    def bin_only(g):
        # Same preprocess + chunk bounds as render_pallas/_chunked_passes.
        p = codec.preprocess(g, H, W, 3.0)
        n_chunks = max(1, -(-N // rp._MAX_SMEM_SPLATS))
        bounds = [i * N // n_chunks for i in range(n_chunks + 1)]
        acc = jnp.int32(0)
        for i in range(n_chunks):
            pc = rp._split_screen(p, bounds[i], bounds[i + 1])
            cn = pc.cx.shape[1]
            idx, cnt = rp._bin_splats(p=pc, n_tx=n_tx, n_ty=n_ty,
                                      tile_h=tile_h, tile_w=tile_w, cap=cn)
            # Touch both outputs so neither the lists nor counts are DCE'd.
            acc = acc + jnp.sum(cnt) + idx[0, 0, 0]
        return acc

    bin_fn = jax.jit(bin_only)

    def timed(fn, sync):
        sync(fn(g9))  # compile + warmup at the timed shape
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(g9)
        sync(out)
        return (time.perf_counter() - t0) / args.iters

    dt_bin = timed(bin_fn, lambda o: int(o))
    dt_render = timed(render, lambda o: float(o.sum()))
    pairs = int(bin_fn(g9))  # includes the idx[0,0,0] touch term (tiny)
    print(
        json.dumps(
            {
                "config": f"N={N} {H}x{W}",
                "render_ms": round(dt_render * 1e3, 2),
                "binning_ms": round(dt_bin * 1e3, 2),
                "binning_share": round(dt_bin / dt_render, 3),
                "pairs_approx": pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
