"""Benchmark suite: the BASELINE.md configs, measured on the attached chip.

Usage:
    python benchmarks/suite.py [--quick] [--out results.json]

Configs (BASELINE.json "configs" + render microbenchmarks):
    render-512           raw fused evaluation, 512 splats @ 512^2
                         (f32 exact, exact-tight, fast, fast @ the
                         validated cull-eps, bf16)
    mix-512              unsharded SSIM/MSE mix evaluation, exact vs fast
    sa-64-gray           SA iterations/s: 64 splats -> 64^2 target
    ga-256               GA generations/s: pop 64, 256 splats -> 256^2
    grad-2k              Adam steps/s: 2000 splats @ 512^2 (pallas VJP)
    grad-10k-1024        Adam steps/s: 10k splats @ 1024^2 (chunk-chained VJP)
    grad-pop-2k          population Adam: 16 genomes x 2k splats @ 512^2
    memetic-256          hybrid GA+SGD generations/s: pop 256 (chunked eval)
    big-10k-1024         fused fitness, 10k splats @ 1024^2 (chunked passes)
    canvas-4k            full-canvas render, 50k splats @ 4096^2 (scatter
                         binning; exact + fast/fast-corner rows)

Each config prints one JSON line; --out also writes the list to a file.
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


def bench_render(quick: bool):
    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec
    from ggs_tpu.ops.render_pallas import fitness_pallas

    H = W = 512
    N = 512
    B = 16 if quick else 64
    g9 = codec.genome_to_renderer(genome.new_population(jax.random.PRNGKey(0), B, N, H, W))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), dtype=jnp.float32)
    wm = jnp.ones((H, W), jnp.float32)
    rows = []
    # (precision, cull_eps, config label): the eps8e-2 row is the largest
    # GA-A/B-validated selection-safe cull (DESIGN §8c ladder).
    variants = [
        ("highest", None, "render-512-highest"),
        ("exact-tight", None, "render-512-exact-tight"),
        ("fast", None, "render-512-fast"),
        ("fast", 8e-2, "render-512-fast-eps8e-2"),
        ("bf16", None, "render-512-bf16"),
    ]
    for prec, eps, label in variants:
        f = jax.jit(
            lambda g, p=prec, e=eps: fitness_pallas(
                g, tgt, wm, H, W, precision=p, cull_eps=e,
                corner_cull=(p == "fast"),
            )
        )
        # >= 50 iters: one ~25 ms readback amortizes (DESIGN.md 8b)
        dt = _time(lambda: f(g9), 10 if quick else 50)
        rows.append(
            {
                "config": label,
                "metric": "candidate renders/s/chip",
                "value": round(B / dt, 1),
                "detail": f"B={B} N={N} {H}x{W} fused fitness",
            }
        )
    return rows


def bench_sa(quick: bool):
    import jax

    from ggs_tpu.config import GenomeConfig, SAConfig
    from ggs_tpu.models import genome, sa
    from ggs_tpu.ops import codec, objective, render

    H = W = 64
    gnm = GenomeConfig(n_splats=64, min_scale=1.0)
    obj = objective.Objective(H=H, W=W)
    # grayscale target (equal channels), per BASELINE config
    g0 = genome.new_population(jax.random.PRNGKey(7), 1, 64, H, W, 1.0, 0.1)[0]
    img = render.render_splats(codec.genome_to_renderer(g0)[None], H, W)[0]
    tgt = img.mean(axis=-1, keepdims=True).repeat(3, axis=-1)
    cfg = SAConfig(iterations=10_000, tries_per_iter=8)
    st = sa.init(jax.random.PRNGKey(0), obj, tgt, None, gnm)
    run = sa.make_run_block(obj, cfg, gnm)
    iters = 50 if quick else 200
    st, m = run(st, tgt, None, iters)  # compile at the same static length
    _sync(m)  # the axon tunnel dispatches async: un-synced warmup bleeds into the timing
    t0 = time.perf_counter()
    st, m = run(st, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return [
        {
            "config": "sa-64-gray",
            "metric": "SA iterations/s (8 proposals each)",
            "value": round(1.0 / dt, 1),
            "detail": "64 splats -> 64x64 grayscale, batched proposals",
        }
    ]


def bench_ga(quick: bool):
    import jax

    from ggs_tpu.config import GAConfig, GenomeConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import codec, objective, render

    H = W = 256
    gnm = GenomeConfig(n_splats=256)
    obj = objective.Objective(H=H, W=W)
    g0 = genome.new_population(jax.random.PRNGKey(7), 1, 256, H, W)[0]
    tgt = render.render_splats(codec.genome_to_renderer(g0)[None], H, W)[0]
    cfg = GAConfig(pop_size=64, generations=100_000, elite_k=8)
    iters = 20 if quick else 100
    rows = []
    # exact-selection GA + the recommended fast evolution mode (DESIGN §8c)
    for label, o in (
        ("ga-256", obj),
        ("ga-256-fast-eps8e-2", obj._replace(precision="fast", cull_eps=8e-2)),
    ):
        st = ga.init(jax.random.PRNGKey(0), o, tgt, None, cfg, gnm)
        run = ga.make_run_block(o, cfg, gnm)
        st, m = run(st, tgt, None, iters)  # compile at the same static length
        _sync(m)  # axon dispatches async: un-synced warmup bleeds into timing
        t0 = time.perf_counter()
        st, m = run(st, tgt, None, iters)
        _sync(m)
        dt = (time.perf_counter() - t0) / iters
        rows.append(
            {
                "config": label,
                "metric": "GA generations/s",
                "value": round(1.0 / dt, 1),
                "detail": "pop 64 x 256 splats -> 256x256 (64 renders/gen)",
            }
        )
    return rows


def bench_grad(quick: bool):
    import jax

    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import genome, gradient
    from ggs_tpu.ops import objective

    H = W = 512
    N = 500 if quick else 2000
    gnm = GenomeConfig(n_splats=N)
    obj = objective.Objective(H=H, W=W)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    cfg = GradConfig(lr=1e-2)
    opt, _ = gradient.make_fit_step(obj, gnm, cfg)
    g0 = genome.new_population(jax.random.PRNGKey(0), 1, N, H, W)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(obj, gnm, cfg)
    iters = 20 if quick else 100
    state, m = run(state, tgt, None, iters)  # compile at the same static length
    _sync(m)  # the axon tunnel dispatches async: un-synced warmup bleeds into the timing
    t0 = time.perf_counter()
    state, m = run(state, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    rows = [
        {
            "config": "grad-2k",
            "metric": "Adam steps/s (fwd+bwd)",
            "value": round(1.0 / dt, 2),
            "detail": f"{N} splats @ 512x512, Pallas custom-VJP",
        }
    ]
    # Fast-mode gradient path (ε-culled boxes through the fused loss+grad
    # kernel, DESIGN §8d) at the recommended evolution ε.
    obj_f = objective.Objective(H=H, W=W, precision="fast", cull_eps=8e-2)
    opt, _ = gradient.make_fit_step(obj_f, gnm, cfg)
    state = gradient.init_state(opt, genome.new_population(jax.random.PRNGKey(0), 1, N, H, W))
    run = gradient.make_run_block(obj_f, gnm, cfg)
    state, m = run(state, tgt, None, iters)
    _sync(m)
    state = gradient.init_state(opt, genome.new_population(jax.random.PRNGKey(0), 1, N, H, W))
    t0 = time.perf_counter()
    state, m = run(state, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    rows.append(
        {
            "config": "grad-2k-fast",
            "metric": "Adam steps/s (fwd+bwd)",
            "value": round(1.0 / dt, 2),
            "detail": f"{N} splats @ 512x512, ε-culled fused loss+grad (ε=8e-2)",
        }
    )
    return rows


def bench_grad_big(quick: bool):
    """Chained-VJP Adam at the multi-host config's gradient scale: 10k
    splats @ 1024^2 (quick: 8.5k @ 512^2). 10k splats exceed one SMEM pass,
    so the backward runs the chunk-chained custom-VJP (render_grad.py's
    chained path) — correctness is tested, this row makes its throughput a
    tracked number (round-2 verdict #4a)."""
    import jax

    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import genome, gradient
    from ggs_tpu.ops import objective

    H = W = 512 if quick else 1024
    N = 8500 if quick else 10_000
    gnm = GenomeConfig(n_splats=N)
    obj = objective.Objective(H=H, W=W)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    cfg = GradConfig(lr=1e-2)
    opt, _ = gradient.make_fit_step(obj, gnm, cfg)
    g0 = genome.new_population(jax.random.PRNGKey(0), 1, N, H, W)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(obj, gnm, cfg)
    iters = 5 if quick else 50
    state, m = run(state, tgt, None, iters)  # compile at the same static length
    _sync(m)
    t0 = time.perf_counter()
    state, m = run(state, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return [
        {
            "config": "grad-10k-1024",
            "metric": "Adam steps/s (fwd+bwd)",
            "value": round(1.0 / dt, 2),
            "detail": f"{N} splats @ {H}x{W}, chunk-chained custom-VJP",
        }
    ]


def bench_grad_pop(quick: bool):
    """Population-batch Adam: B genomes x 2k splats @ 512^2 fitted in one
    jitted block (the memetic path's refinement shape; round-2 verdict
    #4b). Reports batch-steps/s and genome-steps/s."""
    import jax

    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import genome, gradient
    from ggs_tpu.ops import objective

    H = W = 512
    N = 2000
    B = 4 if quick else 16
    gnm = GenomeConfig(n_splats=N)
    obj = objective.Objective(H=H, W=W)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    cfg = GradConfig(lr=1e-2)
    opt, _ = gradient.make_fit_step(obj, gnm, cfg)
    g0 = genome.new_population(jax.random.PRNGKey(0), B, N, H, W)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(obj, gnm, cfg)
    iters = 5 if quick else 50
    state, m = run(state, tgt, None, iters)  # compile at the same static length
    _sync(m)
    t0 = time.perf_counter()
    state, m = run(state, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return [
        {
            "config": "grad-pop-2k",
            "metric": "population Adam steps/s (fwd+bwd)",
            "value": round(1.0 / dt, 2),
            "detail": f"B={B} x {N} splats @ {H}x{W}; "
            f"{round(B / dt, 1)} genome-steps/s",
        }
    ]


def bench_memetic(quick: bool):
    import jax

    from ggs_tpu.config import GAConfig, GenomeConfig, GradConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import codec, objective, render

    H = W = 128
    gnm = GenomeConfig(n_splats=128)
    P = 64 if quick else 256
    obj = objective.Objective(H=H, W=W, chunk=64 if P > 64 else None)
    g0 = genome.new_population(jax.random.PRNGKey(7), 1, 128, H, W)[0]
    tgt = render.render_splats(codec.genome_to_renderer(g0)[None], H, W)[0]
    cfg = GAConfig(pop_size=P, generations=100_000, elite_k=8)
    st = ga.init(jax.random.PRNGKey(0), obj, tgt, None, cfg, gnm)
    run = ga.make_memetic_run_block(
        obj, cfg, gnm, GradConfig(lr=1e-2), refine_every=10, refine_steps=3
    )
    iters = 10 if quick else 50
    st, m = run(st, tgt, None, iters)  # compile at the same static length
    _sync(m)  # the axon tunnel dispatches async: un-synced warmup bleeds into the timing
    t0 = time.perf_counter()
    st, m = run(st, tgt, None, iters)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return [
        {
            "config": "memetic-256",
            "metric": "memetic GA generations/s",
            "value": round(1.0 / dt, 1),
            "detail": f"pop {P} x 128 splats -> 128x128, SGD elites every 10 gens",
        }
    ]


def bench_big(quick: bool):
    """Single-chip slice of the multi-host headline config (pop 4096 x 10k
    splats -> 1024^2, BASELINE.md): 10k splats exceed one SMEM pass, so this
    exercises the chained splat-chunk path."""
    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec
    from ggs_tpu.ops.render_pallas import fitness_pallas

    # quick still uses N > _MAX_SMEM_SPLATS (8000) so both modes exercise
    # the chained splat-chunk path this config exists to cover.
    H = W = 512 if quick else 1024
    N = 8500 if quick else 10_000
    B = 2 if quick else 4
    g9 = codec.genome_to_renderer(genome.new_population(jax.random.PRNGKey(0), B, N, H, W))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), dtype=jnp.float32)
    f = jax.jit(lambda g: fitness_pallas(g, tgt, None, H, W))
    dt = _time(lambda: f(g9), 5 if quick else 20)
    return [
        {
            "config": "big-10k-1024",
            "metric": "candidate renders/s/chip",
            "value": round(B / dt, 2),
            "detail": f"B={B} N={N} {H}x{W} fused fitness (chunked passes)",
        }
    ]


def bench_canvas4k(quick: bool):
    """Large-canvas render: 50k splats -> 4k^2 (quick: 20k -> 2048^2).
    Exercises the pair-scatter Pallas binning (docs/DESIGN.md §12) that
    replaces the dense [B,T,N] sort above 256 tiles."""
    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import codec
    from ggs_tpu.ops.render_pallas import render_pallas

    H = W = 2048 if quick else 4096
    N = 20_000 if quick else 50_000
    g9 = codec.genome_to_renderer(
        genome.new_population(
            jax.random.PRNGKey(0), 1, N, H, W, min_scale=1.0, max_scale=0.02
        )
    )
    f = jax.jit(lambda g: render_pallas(g, H, W))
    dt = _time(lambda: f(g9), 5 if quick else 20)
    rows = [
        {
            "config": "canvas-4k",
            "metric": "full-canvas renders/s",
            "value": round(1.0 / dt, 2),
            "detail": f"N={N} {H}x{W} scatter binning, chained chunk passes",
        }
    ]
    # fast-mode rows (round 5): the exact row above is pinned by the
    # bit-exactness contract and cannot cull; the band-level corner cull
    # (_corner_band_xranges) is a fast-mode feature, so its large-canvas
    # effect shows here — corner OFF vs ON at the validated selection ε.
    for label, corner in (("canvas-4k-fast", False), ("canvas-4k-fast-corner", True)):
        ff = jax.jit(
            lambda g, c=corner: render_pallas(
                g, H, W, precision="fast", cull_eps=8e-2, corner_cull=c
            )
        )
        dtf = _time(lambda: ff(g9), 5 if quick else 20)
        rows.append(
            {
                "config": label,
                "metric": "full-canvas renders/s",
                "value": round(1.0 / dtf, 2),
                "detail": f"N={N} {H}x{W} fast eps=8e-2 corner_cull={corner}",
            }
        )
    return rows


def bench_mix(quick: bool):
    """Unsharded SSIM/mix evaluation, exact vs fast (round 5: the
    single-chip metric branch honors precision/cull_eps/corner_cull —
    VERDICT r4 weak #2; this row is the measured delta)."""
    import jax
    import jax.numpy as jnp

    from ggs_tpu.models import genome
    from ggs_tpu.ops import objective

    H = W = 512
    N = 512
    B = 16 if quick else 64
    pop = genome.new_population(jax.random.PRNGKey(0), B, N, H, W)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), dtype=jnp.float32)
    wm = jnp.ones((H, W), jnp.float32)
    rows = []
    for label, obj in (
        ("mix-512-exact", objective.Objective(H=H, W=W, metric="mix")),
        ("mix-512-fast-eps8e-2",
         objective.Objective(H=H, W=W, metric="mix", precision="fast",
                             cull_eps=8e-2)),
    ):
        f = jax.jit(lambda p, o=obj: objective.evaluate(o, p, tgt, wm))
        dt = _time(lambda: f(pop), 5 if quick else 20)
        rows.append(
            {
                "config": label,
                "metric": "candidate mix-evals/s/chip",
                "value": round(B / dt, 2),
                "detail": f"B={B} N={N} {H}x{W} SSIM/MSE mix, unsharded "
                "image path",
            }
        )
    return rows


BENCHES = {
    "render": bench_render,
    "mix": bench_mix,
    "sa": bench_sa,
    "ga": bench_ga,
    "grad": bench_grad,
    "gradbig": bench_grad_big,
    "gradpop": bench_grad_pop,
    "memetic": bench_memetic,
    "big": bench_big,
    "canvas4k": bench_canvas4k,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="", help="comma-separated subset of benches")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    print(f"[suite] backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)
    names = args.only.split(",") if args.only else list(BENCHES)
    results = []
    for name in names:
        try:
            rows = BENCHES[name](args.quick)
        except Exception as e:  # keep the suite running past one failure
            rows = [{"config": name, "error": f"{type(e).__name__}: {e}"}]
        for r in rows:
            print(json.dumps(r))
            results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
