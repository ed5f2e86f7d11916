"""Pallas kernel vs oracle (interpret mode on CPU; the same kernel runs
compiled on TPU where it is bit-exact vs the oracle — verified on-chip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggs_tpu.models import genome
from ggs_tpu.ops import codec, oracle
from ggs_tpu.ops.render_pallas import max_bin_count, render_pallas


def _genomes(key, B, N, H, W, max_scale=0.3):
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=max_scale)
    return codec.genome_to_renderer(g)


@pytest.mark.parametrize(
    "H,W,tile_h,tile_w",
    [
        (32, 128, 16, 128),  # exact tiling
        (40, 200, 16, 128),  # ragged edges
        (48, 64, 8, 128),  # canvas narrower than one tile
    ],
)
def test_pallas_matches_oracle(key, H, W, tile_h, tile_w):
    g9 = _genomes(key, 3, 16, H, W)
    ref = oracle.render_xla(g9, H, W)
    got = render_pallas(g9, H, W, tile_h=tile_h, tile_w=tile_w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_single_genome(key):
    g9 = _genomes(key, 1, 8, 32, 128)[0]
    img = render_pallas(g9, 32, 128, interpret=True)
    assert img.shape == (32, 128, 3)


def test_pallas_background(key):
    g9 = _genomes(key, 1, 4, 16, 128)
    g9 = g9.at[..., 8].set(0.0)
    img = render_pallas(g9, 16, 128, background=(0.2, 0.4, 0.6), interpret=True)
    np.testing.assert_allclose(np.asarray(img[..., 0]), 0.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img[..., 2]), 0.6, atol=1e-6)


def test_pallas_painter_order(key):
    """Later index paints on top, exactly as in the oracle."""
    H, W = 32, 128
    mk = lambda color: [0.5, 0.5, np.log(8.0), np.log(8.0), 0.0, *color, 255.0]
    g9 = codec.genome_to_renderer(
        jnp.array([mk((255.0, 0.0, 0.0)), mk((0.0, 0.0, 255.0))])
    )
    img = render_pallas(g9[None], H, W, interpret=True)[0]
    c = np.asarray(img)[H // 2, W // 2]
    assert c[2] > c[0]


def test_bin_capacity_lossless_default(key):
    """cap = N never drops splats: equal to oracle even with huge splats
    saturating every tile."""
    H, W = 32, 128
    g9 = _genomes(key, 2, 12, H, W, max_scale=1.0)  # large splats, heavy overlap
    ref = oracle.render_xla(g9, H, W)
    got = render_pallas(g9, H, W, interpret=True)  # bin_capacity=None -> N
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_max_bin_count_diagnostic(key):
    H, W = 32, 128
    g9 = _genomes(key, 2, 12, H, W, max_scale=1.0)
    mc = int(max_bin_count(g9, H, W))
    assert 1 <= mc <= 12
    # rendering with cap >= max count must equal lossless rendering
    full = render_pallas(g9, H, W, interpret=True)
    capped = render_pallas(g9, H, W, bin_capacity=mc, interpret=True)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(full), atol=1e-6)


def test_render_dispatcher_pallas(key):
    from ggs_tpu.ops import render

    g9 = _genomes(key, 2, 8, 32, 128)
    # dispatcher route (interpret not exposed there; run via direct call on CPU
    # interpret and compare against dispatcher xla)
    a = render.render_splats(g9, 32, 128, impl="xla")
    b = render_pallas(g9, 32, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_chunked_passes_bitexact(monkeypatch, key):
    """Forcing the SMEM splat-chunking path (sequential passes chained
    through init_canvas) must reproduce the single-pass render bit-exactly:
    'over' composites associatively in painter order and the mid-pass clamp
    is a no-op on in-gamut values."""
    from ggs_tpu.ops import render_pallas as rp

    H = W = 32
    g = genome.new_population(key, 2, 20, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)

    one_pass = rp.render_pallas(g9, H, W, tile_h=8, tile_w=128, interpret=True)
    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 7)  # -> 3 passes
    rp.render_pallas.clear_cache()  # same static args: force a retrace
    chunked = rp.render_pallas(g9, H, W, tile_h=8, tile_w=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(one_pass))

    target = jnp.clip(one_pass[0] + 0.05, 0, 1)
    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 8000)
    rp.fitness_pallas.clear_cache()
    f_one = rp.fitness_pallas(g9, target, None, H, W, tile_h=8, interpret=True)
    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 7)
    rp.fitness_pallas.clear_cache()
    f_chunk = rp.fitness_pallas(g9, target, None, H, W, tile_h=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_chunk), np.asarray(f_one))
    rp.render_pallas.clear_cache()
    rp.fitness_pallas.clear_cache()


@pytest.mark.slow
def test_odd_resolution_matches_oracle(key):
    """Non-tile-aligned canvases (H, W not multiples of the tile) render
    via padding + slice and must match the oracle (float tolerance on the
    CPU interpreter; bit-exact when compiled on TPU like the aligned
    cases)."""
    from ggs_tpu.ops import render_pallas as rp

    H, W = 75, 131
    g = genome.new_population(key, 2, 12, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)
    a = rp.render_pallas(g9, H, W, tile_h=16, tile_w=128, interpret=True)
    b = oracle.render_xla(g9, H, W)
    assert a.shape == (2, H, W, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    tgt = jnp.clip(b[0] + 0.03, 0, 1)
    f_img = jnp.mean((b - tgt[None]) ** 2, axis=(1, 2, 3))
    f_fused = rp.fitness_pallas(g9, tgt, None, H, W, tile_h=16, interpret=True)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_img), rtol=5e-5)


def test_adversarial_genomes_match_oracle(key):
    """Edge-case splats — alpha exactly 0/255, min/max scales, centers on
    the [0,1] boundary, extreme rotations — through the kernel vs oracle."""
    H, W = 40, 131
    N = 14
    g = genome.new_population(key, 1, N, H, W, 1.0, 0.5)[0]
    g = g.at[0, 8].set(0.0)      # fully transparent
    g = g.at[1, 8].set(255.0)    # fully opaque
    g = g.at[2, 0:2].set(0.0)    # corner center
    g = g.at[3, 0:2].set(1.0)    # opposite corner
    g = g.at[4, 2:4].set(jnp.log(1e-3))   # degenerate tiny sigma
    g = g.at[5, 2:4].set(jnp.log(500.0))  # sigma >> canvas
    g = g.at[6, 4].set(np.pi)    # theta at the wrap boundary
    g = g.at[7, 4].set(-np.pi)
    g = g.at[8, 5:8].set(0.0)    # black
    g = g.at[9, 5:8].set(255.0)  # white
    g9 = codec.genome_to_renderer(g[None])

    from ggs_tpu.ops import render_pallas as rp

    a = rp.render_pallas(g9, H, W, tile_h=8, tile_w=128, interpret=True)
    b = oracle.render_xla(g9, H, W)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.slow
def test_fuzz_random_configs_match_oracle():
    """Randomized shapes/populations through kernel-vs-oracle."""
    from ggs_tpu.ops import render_pallas as rp

    rng = np.random.default_rng(7)
    for trial in range(4):
        H = int(rng.integers(9, 70))
        W = int(rng.integers(16, 200))
        N = int(rng.integers(1, 24))
        B = int(rng.integers(1, 4))
        k = jax.random.PRNGKey(trial)
        g = genome.new_population(k, B, N, H, W, 1.0, float(rng.uniform(0.2, 1.0)))
        g9 = codec.genome_to_renderer(g)
        a = rp.render_pallas(g9, H, W, tile_h=8, tile_w=128, interpret=True)
        b = oracle.render_xla(g9, H, W)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6,
            err_msg=f"trial={trial} H={H} W={W} N={N} B={B}",
        )


@pytest.mark.slow
def test_fast_mode_close_to_oracle(key):
    """precision="fast" (exp2/log2-alpha folding + open-interval threshold
    mask, _splat_feats_turbo, PLUS the epsilon-contribution tile cull —
    _bin_splats_dense ell) must stay within ~the cull epsilon (2e-3
    default, sub-u8-quantum) of the exact render, including chained chunk
    passes and the fused fitness, with identical fitness RANKING."""
    from ggs_tpu.ops.render_pallas import fitness_pallas

    H, W = 40, 200
    g9 = _genomes(key, 3, 24, H, W)
    ref = oracle.render_xla(g9, H, W)
    got = render_pallas(g9, H, W, tile_h=16, interpret=True, precision="fast")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=4e-3)

    tgt = jax.random.uniform(jax.random.PRNGKey(77), (H, W, 3))
    f_exact = fitness_pallas(g9, tgt, None, H, W, tile_h=16, interpret=True)
    f_fast = fitness_pallas(
        g9, tgt, None, H, W, tile_h=16, interpret=True, precision="fast"
    )
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_exact), rtol=1e-3)
    assert (
        np.argsort(np.asarray(f_fast)) == np.argsort(np.asarray(f_exact))
    ).all()


@pytest.mark.slow
def test_fast_mode_cull_reduces_pairs(key):
    """The fast-mode tight-AABB cull (_tighten_boxes: r_eff-sigma extents
    instead of the conservative k*(|l21|+|l22|) bound) must (a) strictly
    reduce the binned pair count on real populations, (b) drop alpha=0
    splats from every list, and (c) keep the culled fast render within
    the documented tolerance of the oracle."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops.render_pallas import (
        _bin_splats_dense, _tighten_boxes, _cdiv,
    )

    H, W = 256, 256
    g9 = _genomes(key, 4, 96, H, W, max_scale=0.4)
    g9 = g9.at[:, ::7, 8].set(0.0)  # some invisible splats
    p = codec_mod.preprocess(g9, H, W, 3.0)
    pt = _tighten_boxes(p, 3.0)
    # live tight boxes only ever shrink (intersection with the
    # conservative box); dead splats get the sentinel empty box 1..-1
    live = np.asarray(p.a) > 0.0
    for tight, cons, cmp in (
        (pt.x0, p.x0, np.greater_equal), (pt.x1, p.x1, np.less_equal),
        (pt.y0, p.y0, np.greater_equal), (pt.y1, p.y1, np.less_equal),
    ):
        assert cmp(np.asarray(tight), np.asarray(cons))[live].all()
    assert (np.asarray(pt.x0) > np.asarray(pt.x1))[~live].all()
    n_tx, n_ty = _cdiv(W, 128), _cdiv(H, 32)
    _, c0 = _bin_splats_dense(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, 32, 128, 96)
    idx1, c1 = _bin_splats_dense(pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, 32, 128, 96)
    assert int(jnp.sum(c1)) < int(jnp.sum(c0))
    dead = np.flatnonzero(np.asarray(g9[0, :, 8]) == 0.0)
    listed = set(np.unique(np.asarray(idx1[0]))[:-1].tolist())  # drop sentinel
    assert not set(dead.tolist()) & listed
    # the culled fast render still matches the oracle to ~the k-sigma tail
    ref = oracle.render_xla(g9, H, W)
    got = render_pallas(g9, H, W, tile_h=32, interpret=True, precision="fast")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    assert float(jnp.mean(jnp.abs(got - ref))) < 2e-4


@pytest.mark.slow
def test_cull_eps_parameter(key):
    """cull_eps as a first-class knob (DESIGN §8c): the parameter must
    override the DEFAULT_CULL_EPS module default everywhere it is threaded —
    _tighten_boxes, fitness_pallas, and Objective.evaluate — with larger ε
    yielding strictly smaller boxes on low-alpha splats, while None
    reproduces the module default bit-for-bit."""
    from ggs_tpu.ops import fitness
    from ggs_tpu.ops import objective as objective_mod
    from ggs_tpu.ops import render_pallas as rp

    H, W = 64, 128
    g9 = _genomes(key, 2, 48, H, W, max_scale=0.4)
    # force low alphas (30/255 ~ 0.12) so the eps term, not the k-sigma
    # clamp, binds in _tighten_boxes' radius formula
    g9 = g9.at[:, :, 8].set(30.0)
    p = codec.preprocess(g9, H, W, 3.0)
    pt_small = rp._tighten_boxes(p, 3.0, cull_eps=2e-3)
    pt_big = rp._tighten_boxes(p, 3.0, cull_eps=5e-2)
    area = lambda q: np.asarray(  # noqa: E731
        (jnp.maximum(q.x1 - q.x0 + 1, 0)) * (jnp.maximum(q.y1 - q.y0 + 1, 0))
    )
    assert area(pt_big).sum() < area(pt_small).sum()
    # None == the DEFAULT_CULL_EPS module constant
    pt_none = rp._tighten_boxes(p, 3.0)
    pt_env = rp._tighten_boxes(p, 3.0, cull_eps=rp.DEFAULT_CULL_EPS)
    for f in ("x0", "x1", "y0", "y1"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pt_none, f)), np.asarray(getattr(pt_env, f))
        )

    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (H, W, 3), jnp.float32)
    f_def = rp.fitness_pallas(g9, tgt, None, H, W, interpret=True,
                              precision="fast")
    f_none = rp.fitness_pallas(g9, tgt, None, H, W, interpret=True,
                               precision="fast", cull_eps=None)
    np.testing.assert_array_equal(np.asarray(f_def), np.asarray(f_none))
    # threading through Objective: a huge eps visibly changes the energy
    obj_small = objective_mod.Objective(H=H, W=W, impl="pallas",
                                        precision="fast", interpret=True,
                                        cull_eps=2e-3)
    obj_big = obj_small._replace(cull_eps=0.11)  # culls every alpha<=0.11 splat
    # evaluate() takes axes-angle genomes; build one with low alphas
    g = genome.new_population(jax.random.fold_in(key, 3), 2, 48, H, W,
                              min_scale=1.0, max_scale=0.4)
    g = g.at[:, :, 7].set(30.0)  # alpha channel (0..255 scale)
    e_small = objective_mod.evaluate(obj_small, g, tgt, None)
    e_big = objective_mod.evaluate(obj_big, g, tgt, None)
    assert not np.allclose(np.asarray(e_small), np.asarray(e_big))


def test_exact_tight_bitexact_vs_tight_oracle(key):
    """precision="exact-tight" (deterministic tight k-sigma box, no ε, no
    tolerance argument — codec.tighten_boxes_exact) must be BIT-EXACT vs
    the tight-box oracle (oracle.render_xla(box="tight")): same walk
    expression as the bit-exact "highest" tier, same box expression by
    construction (one shared function). CPU interpret mode only reaches
    float tolerance (like test_pallas_matches_oracle); the on-chip
    bit-exactness is pinned in test_tpu_exactness."""
    from ggs_tpu.ops import render_pallas as rp

    H, W = 40, 200
    g9 = _genomes(key, 3, 24, H, W, max_scale=0.15)  # small: tight box binds
    ref = oracle.render_xla(g9, H, W, box="tight")
    got = render_pallas(
        g9, H, W, tile_h=16, interpret=True, precision="exact-tight"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # the tier is exercised: tight truncation differs from the
    # conservative-box render (k-sigma tail strip), both only slightly
    ref_cons = oracle.render_xla(g9, H, W)
    d = float(jnp.max(jnp.abs(ref - ref_cons)))
    assert 0.0 < d < 2e-2, d
    # fused fitness: equals the image-path fitness on tight-box renders
    tgt = jax.random.uniform(jax.random.PRNGKey(5), (H, W, 3), jnp.float32)
    f_img = jnp.mean((ref - tgt[None]) ** 2, axis=(1, 2, 3))
    f_fused = rp.fitness_pallas(
        g9, tgt, None, H, W, tile_h=16, interpret=True, precision="exact-tight"
    )
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_img), rtol=5e-5)
    # cull_eps is a fast-mode knob: exact-tight must ignore it entirely
    got2 = render_pallas(
        g9, H, W, tile_h=16, interpret=True, precision="exact-tight",
        cull_eps=1e-1,
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_exact_tight_pair_counts_between_fast_and_conservative(key):
    """The exact-tight box sits between the reference-conservative box and
    the fast ε-box: pairs(fast, any ε) <= pairs(exact-tight) <=
    pairs(conservative), strictly fewer than conservative on anisotropic
    populations (where the √2-over-tall hy bound actually binds)."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops import render_pallas as rp

    H, W = 256, 256
    g9 = _genomes(key, 4, 96, H, W, max_scale=0.4)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    pt = codec_mod.tighten_boxes_exact(p, 3.0)
    pf = rp._tighten_boxes(p, 3.0, cull_eps=2e-3)
    n_tx, n_ty = rp._cdiv(W, 128), rp._cdiv(H, 32)
    count = lambda q: int(  # noqa: E731
        jnp.sum(
            rp._bin_splats_dense(q.x0, q.x1, q.y0, q.y1, n_tx, n_ty, 32, 128, 96)[1]
        )
    )
    assert count(pf) <= count(pt) < count(p)


def test_corner_keep_matches_bruteforce(key):
    """_corner_keep's closed-form rect-max (two visible-edge clamped
    vertices of the concave log2-contribution) must never cull a
    (tile, splat) pair whose brute-force max over the pair's integer
    pixel rect reaches the cull ε — the conservativeness that bounds the
    corner cull's error to the same ε class as the tight box."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops import render_pallas as rp

    B, N, H, W = 2, 48, 128, 128
    tile_h = tile_w = 32
    n_tx, n_ty = W // tile_w, H // tile_h
    eps = 8e-2
    g9 = _genomes(key, B, N, H, W, max_scale=0.4)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    p = rp._tighten_boxes(p, 3.0, eps)
    corner = rp._corner_params(p, eps)
    T = n_tx * n_ty
    t_ids = jnp.arange(T, dtype=jnp.int32)
    t_x = (t_ids % n_tx)[None, :, None]
    t_y = (t_ids // n_tx)[None, :, None]
    keep = np.asarray(
        rp._corner_keep(corner, p.x0, p.x1, p.y0, p.y1, t_x, t_y, tile_h, tile_w)
    )
    cx, cy, nsxx, nsxy, nsyy, log2a, log2eps = (np.asarray(c) for c in corner)
    x0, x1 = np.asarray(p.x0), np.asarray(p.x1)
    y0, y1 = np.asarray(p.y0), np.asarray(p.y1)
    n_overlap = n_culled = 0
    for b in range(B):
        for t in range(T):
            txv, tyv = t % n_tx, t // n_tx
            for n in range(N):
                lo_x = max(txv * tile_w, x0[b, n])
                hi_x = min(txv * tile_w + tile_w - 1, x1[b, n])
                lo_y = max(tyv * tile_h, y0[b, n])
                hi_y = min(tyv * tile_h + tile_h - 1, y1[b, n])
                if lo_x > hi_x or lo_y > hi_y:
                    continue  # no AABB overlap; keep value never read
                n_overlap += 1
                n_culled += not keep[b, t, n]
                dxs = np.arange(lo_x, hi_x + 1) - cx[b, n]
                dys = (np.arange(lo_y, hi_y + 1) - cy[b, n])[:, None]
                val = (
                    nsxx[b, n] * dxs * dxs + nsxy[b, n] * dxs * dys
                    + nsyy[b, n] * dys * dys + log2a[b, n]
                )
                if val.max() >= log2eps:
                    assert keep[b, t, n], (b, t, n, float(val.max()), log2eps)
    assert n_culled > 0, "protocol error: no corner-cullable pair sampled"
    assert n_overlap > 0


@pytest.mark.slow
def test_corner_cull_within_tolerance(key):
    """corner_cull=True (fitness_pallas prep path, render_pallas p path,
    Objective threading) must stay inside the fast mode's ε tolerance
    while strictly reducing the binned pair count vs tight boxes alone."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops import objective as objective_mod
    from ggs_tpu.ops import render_pallas as rp

    H, W = 128, 256
    eps = 8e-2
    g9 = _genomes(key, 3, 48, H, W, max_scale=0.4)
    tgt = jax.random.uniform(jax.random.fold_in(key, 9), (H, W, 3), jnp.float32)

    # pair counts: corner cull only ever removes pairs
    p = codec_mod.preprocess(g9, H, W, 3.0)
    pt = rp._tighten_boxes(p, 3.0, eps)
    n_tx, n_ty = rp._cdiv(W, 128), rp._cdiv(H, 32)
    _, c_box = rp._bin_splats_dense(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, 32, 128, 48
    )
    _, c_corner = rp._bin_splats_dense(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, 32, 128, 48,
        corner=rp._corner_params(pt, eps),
    )
    assert int(jnp.sum(c_corner)) < int(jnp.sum(c_box))

    # fused fitness (single-chunk turbo prep path slices ff for corner)
    f_fast = rp.fitness_pallas(
        g9, tgt, None, H, W, interpret=True, precision="fast", cull_eps=eps
    )
    f_corner = rp.fitness_pallas(
        g9, tgt, None, H, W, interpret=True, precision="fast", cull_eps=eps,
        corner_cull=True,
    )
    np.testing.assert_allclose(np.asarray(f_corner), np.asarray(f_fast), atol=2e-3)
    # render path (corner params from the SplatScreen)
    r_fast = render_pallas(
        g9, H, W, interpret=True, precision="fast", cull_eps=eps
    )
    r_corner = render_pallas(
        g9, H, W, interpret=True, precision="fast", cull_eps=eps,
        corner_cull=True,
    )
    assert float(jnp.max(jnp.abs(r_corner - r_fast))) <= eps * 1.5
    # exact mode ignores the flag entirely (bit-exact contract)
    r_ex = render_pallas(g9, H, W, interpret=True)
    r_ex_flag = render_pallas(g9, H, W, interpret=True, corner_cull=True)
    np.testing.assert_array_equal(np.asarray(r_ex), np.asarray(r_ex_flag))
    # Objective threading
    g = genome.new_population(jax.random.fold_in(key, 3), 2, 48, H, W,
                              min_scale=1.0, max_scale=0.4)
    obj = objective_mod.Objective(H=H, W=W, impl="pallas", precision="fast",
                                  interpret=True, cull_eps=eps)
    e_box = objective_mod.evaluate(obj, g, tgt, None)
    e_corner = objective_mod.evaluate(
        obj._replace(corner_cull=True), g, tgt, None
    )
    np.testing.assert_allclose(np.asarray(e_corner), np.asarray(e_box), atol=2e-3)


@pytest.mark.slow
def test_fast_mode_zero_alpha_and_sentinel(key):
    """alpha = 0 splats must contribute exactly nothing in fast mode
    (log2(alpha) = -inf => exp2 = 0, and the cull drops them from the
    lists entirely), matching the exact kernel."""
    g9 = _genomes(key, 1, 6, 32, 128)
    g9 = g9.at[:, ::2, 8].set(0.0)  # kill alternating splats
    ref = render_pallas(g9, 32, 128, interpret=True)
    got = render_pallas(g9, 32, 128, interpret=True, precision="fast")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=4e-3)
    only_live = render_pallas(g9[:, 1::2], 32, 128, interpret=True, precision="fast")
    np.testing.assert_allclose(np.asarray(got), np.asarray(only_live), atol=1e-6)


def test_scatter_binning_matches_dense(key):
    """The pair-scatter Pallas binning (large-canvas path) must reproduce
    the dense sort-compaction exactly: same counts, same ascending lists
    below cnt, sentinel window above, including the cap-truncation rule."""
    from ggs_tpu.ops.render_pallas import (
        _SCATTER_PAD, _bin_splats_scatter, _bin_splats_xy, _cdiv,
    )

    H, W = 96, 256
    n_tx, n_ty, th, tw = 2, 6, 16, 128
    g9 = _genomes(key, 2, 40, H, W, max_scale=0.5)
    from ggs_tpu.ops import codec as codec_mod

    p = codec_mod.preprocess(g9, H, W, 3.0)
    for cap in (40, 8):  # lossless and truncating
        di, dc = _bin_splats_xy(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, cap)
        si, sc = _bin_splats_scatter(
            p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, cap, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
        di, si, dc = np.asarray(di), np.asarray(si), np.asarray(dc)
        for b in range(di.shape[0]):
            for t in range(di.shape[1]):
                c = dc[b, t]
                np.testing.assert_array_equal(si[b, t, :c], di[b, t, :c])
                pad_end = min(c + _SCATTER_PAD, cap)
                assert (si[b, t, c:pad_end] == 40).all()


def test_scatter_binning_odd_tile_count(key):
    """Tile counts NOT divisible by the blocked-loop widths (8 for the
    zero-init walk, 4 for the finish walk) exercise _blocked_fori's
    unrolled remainder stores — a single-group scatter config can have
    any tile count (the %8 constraint only applies when n_groups > 1)."""
    from ggs_tpu.ops.render_pallas import _bin_splats_scatter, _bin_splats_xy
    from ggs_tpu.ops import codec as codec_mod

    H, W = 32, 384
    n_tx, n_ty, th, tw = 3, 2, 16, 128  # tiles = 6: %8 != 0, %4 != 0
    g9 = _genomes(key, 2, 30, H, W, max_scale=0.5)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    di, dc = _bin_splats_xy(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 30)
    si, sc = _bin_splats_scatter(
        p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 30, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
    di, si, dc = np.asarray(di), np.asarray(si), np.asarray(dc)
    for b in range(di.shape[0]):
        for t in range(di.shape[1]):
            c = dc[b, t]
            np.testing.assert_array_equal(si[b, t, :c], di[b, t, :c])


def test_scatter_binning_negative_rows(key):
    """Row-slab shifts can push AABBs to negative tile rows (the sharded
    partial paths); scatter must match dense there too."""
    from ggs_tpu.ops.render_pallas import _bin_splats_scatter, _bin_splats_xy
    from ggs_tpu.ops import codec as codec_mod

    H, W = 64, 128
    g9 = _genomes(key, 1, 24, H, W, max_scale=0.5)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    y0s, y1s = p.y0 - 32, p.y1 - 32  # shift half the canvas up
    di, dc = _bin_splats_xy(p.x0, p.x1, y0s, y1s, 1, 2, 16, 128, 24)
    si, sc = _bin_splats_scatter(
        p.x0, p.x1, y0s, y1s, 1, 2, 16, 128, 24, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
    di, si, dc = np.asarray(di), np.asarray(si), np.asarray(dc)
    for t in range(di.shape[1]):
        c = dc[0, t]
        np.testing.assert_array_equal(si[0, t, :c], di[0, t, :c])


def test_scatter_binning_two_level(key):
    """A tiny SMEM budget forces the two-level (coarse band -> fine group)
    scatter; lists must still match dense exactly."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops.render_pallas import _bin_splats_scatter, _bin_splats_xy

    H, W = 512, 128
    n_tx, n_ty, th, tw = 1, 32, 16, 128
    g9 = _genomes(key, 2, 64, H, W, max_scale=0.3)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    di, dc = _bin_splats_xy(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 64)
    si, sc = _bin_splats_scatter(
        p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 64,
        interpret=True, smem_budget=2048,  # forces > _N_COARSE raw groups
    )
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
    di, si, dc = np.asarray(di), np.asarray(si), np.asarray(dc)
    for b in range(di.shape[0]):
        for t in range(di.shape[1]):
            c = dc[b, t]
            np.testing.assert_array_equal(si[b, t, :c], di[b, t, :c])


@pytest.mark.slow
def test_scatter_binning_capacity_overflow_falls_back(key):
    """When the SMEM budget caps the per-tile list below the requested
    capacity (cap_s < cap) AND a tile actually holds more splats than
    cap_s, the scatter path must NOT silently truncate: it detects the
    overflow on device and recomputes with the dense path, so the result
    is always identical to dense at the requested cap."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops.render_pallas import _bin_splats_dense, _bin_splats_scatter

    H, W = 512, 128
    n_tx, n_ty, th, tw = 1, 32, 16, 128
    N = 96
    # All splats centered on the same spot -> one tile sees all 96 of
    # them, far beyond the ~63-entry capacity a 2 KiB budget allows.
    g = jnp.tile(
        jnp.array([[0.5, 0.5, np.log(4.0), np.log(4.0), 0.0, 128.0, 128.0, 128.0, 128.0]]),
        (N, 1),
    )[None]
    p = codec_mod.preprocess(codec_mod.genome_to_renderer(g), H, W, 3.0)
    di, dc = _bin_splats_dense(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, N)
    si, sc = _bin_splats_scatter(
        p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, N,
        interpret=True, smem_budget=2048,
    )
    assert int(np.asarray(dc).max()) > 63  # the overflow regime is exercised
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
    np.testing.assert_array_equal(np.asarray(di), np.asarray(si))

    # Spread splats with cap_s (= 35 at a 1152 B budget) < cap but no tile
    # overflowing: the scatter result is used directly, lists equal below
    # cnt.
    g9 = _genomes(key, 1, 40, H, W, max_scale=0.2)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    di, dc = _bin_splats_dense(p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 40)
    assert int(np.asarray(dc).max()) <= 35
    si, sc = _bin_splats_scatter(
        p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, th, tw, 40,
        interpret=True, smem_budget=1152,
    )
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(sc))
    di, si, dc = np.asarray(di), np.asarray(si), np.asarray(dc)
    for t in range(di.shape[1]):
        c = dc[0, t]
        np.testing.assert_array_equal(si[0, t, :c], di[0, t, :c])


@pytest.mark.slow
def test_scatter_corner_band_cull(key):
    """Round-5 (r4 verdict item 5): the corner cull's vectorized band-level
    form in the scatter binning path. Per tile:
      dense-corner lists ⊆ scatter-corner lists ⊆ box-only lists
    (left: the band-level x-marginal is weaker than the per-tile rect-max,
    so it may only cull a SUBSET of the dense corner cull's pairs — which
    test_corner_keep_matches_bruteforce already pins as ε-sound; right:
    culling only removes pairs), with strict shrink overall (engagement),
    ascending order preserved, and the full render within fast tolerance."""
    from ggs_tpu.ops import codec as codec_mod
    from ggs_tpu.ops import render_pallas as rp

    H, W = 512, 256
    tile_h, tile_w = 32, 128
    n_tx, n_ty = W // tile_w, H // tile_h  # 2 x 16 tiles
    N, B, eps = 64, 2, 8e-2
    g9 = _genomes(key, B, N, H, W, max_scale=0.5)
    p = codec_mod.preprocess(g9, H, W, 3.0)
    pt = rp._tighten_boxes(p, 3.0, eps)
    corner = rp._corner_params(pt, eps)

    idx_box, cnt_box = rp._bin_splats_scatter(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, tile_h, tile_w, N,
        interpret=True,
    )
    idx_sc, cnt_sc = rp._bin_splats_scatter(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, tile_h, tile_w, N,
        interpret=True, corner=corner,
    )
    idx_dc, cnt_dc = rp._bin_splats_dense(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, tile_h, tile_w, N,
        corner=corner,
    )
    assert int(jnp.sum(cnt_sc)) < int(jnp.sum(cnt_box))  # engagement
    T = n_tx * n_ty
    for b in range(B):
        for t in range(T):
            box = np.asarray(idx_box[b, t, : int(cnt_box[b, t])]).tolist()
            sc = np.asarray(idx_sc[b, t, : int(cnt_sc[b, t])]).tolist()
            dc = np.asarray(idx_dc[b, t, : int(cnt_dc[b, t])]).tolist()
            assert set(dc) <= set(sc) <= set(box), (b, t)
            assert sc == sorted(sc)  # ascending painter order preserved

    # full path: a >= 256-tile canvas dispatches to scatter inside
    # render_pallas; fast+corner must stay within the fast ε class
    H2, W2 = 1024, 512  # 16 x 32 = 512 tiles at the default 64x128
    g2 = _genomes(jax.random.fold_in(key, 5), 1, 48, H2, W2, max_scale=0.4)
    r_box = render_pallas(
        g2, H2, W2, interpret=True, precision="fast", cull_eps=eps
    )
    r_cor = render_pallas(
        g2, H2, W2, interpret=True, precision="fast", cull_eps=eps,
        corner_cull=True,
    )
    assert float(jnp.max(jnp.abs(r_cor - r_box))) <= eps * 1.5
