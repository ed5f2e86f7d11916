"""Binning breakdown microbench: where do the 4k^2 scatter-binning
milliseconds go? (round-2 verdict #3 / docs/ROADMAP.md "vectorize append
positions").

Times, at the canvas-4k config's per-chunk shape (8192-splat chunk,
4096^2 canvas, 32x128 tiles -> 4096 tiles):

    render       full render_pallas step (all chunks)
    scatter      _bin_splats_scatter alone, jitted (one chunk)
    dense        _bin_splats_dense alone (the XLA sort path, for scale)
    pairs        mean (tile, splat) pairs per chunk (the work driver)

Usage: python benchmarks/binning_bench.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).sum())


def _time(fn, iters):
    out = fn()
    _sync(out)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec
    from ggs_tpu.ops import render_pallas as rp

    H = W = 2048 if args.quick else 4096
    N_full = 20_000 if args.quick else 50_000
    iters = args.iters or (5 if args.quick else 20)
    tile_h, tile_w = 32, 128
    n_tx, n_ty = W // tile_w, H // tile_h

    g9 = codec.genome_to_renderer(
        genome.new_population(
            jax.random.PRNGKey(0), 1, N_full, H, W, min_scale=1.0, max_scale=0.02
        )
    )
    p_full = codec.preprocess(g9, H, W, 3.0)
    # one SMEM chunk, exactly what each chained pass bins
    Nc = min(N_full, rp._MAX_SMEM_SPLATS)
    p = jax.tree.map(lambda a: a[:, :Nc], p_full)

    rows = []

    f_render = jax.jit(lambda g: rp.render_pallas(g, H, W))
    dt = _time(lambda: f_render(g9), iters)
    rows.append({"config": "render", "ms": round(dt * 1e3, 2),
                 "detail": f"N={N_full} {H}x{W} full step"})

    f_scat = jax.jit(
        lambda x0, x1, y0, y1: rp._bin_splats_scatter(
            x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, Nc
        )
    )
    dt = _time(lambda: f_scat(p.x0, p.x1, p.y0, p.y1)[1], iters)
    rows.append({"config": "scatter-chunk", "ms": round(dt * 1e3, 2),
                 "detail": f"one {Nc}-splat chunk, {n_tx * n_ty} tiles"})

    if not args.quick:
        f_dense = jax.jit(
            lambda x0, x1, y0, y1: rp._bin_splats_dense(
                x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, Nc
            )
        )
        dt = _time(lambda: f_dense(p.x0, p.x1, p.y0, p.y1)[1], 3)
        rows.append({"config": "dense-chunk", "ms": round(dt * 1e3, 2),
                     "detail": "XLA [B,T,N] sort path at the same shape"})

    # pair count: how much append work there actually is
    tx0, tx1 = p.x0 // tile_w, p.x1 // tile_w
    ty0, ty1 = p.y0 // tile_h, p.y1 // tile_h
    pairs = jnp.sum(
        jnp.maximum(tx1 - tx0 + 1, 0) * jnp.maximum(ty1 - ty0 + 1, 0)
    )
    rows.append({"config": "pairs-chunk", "value": int(pairs),
                 "detail": "(tile, splat) pairs in the chunk"})

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
