"""Differentiable Pallas renderer: forward parity + backward exactness
vs the oracle's autodiff and vs finite differences (BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.models import genome
from ggs_tpu.ops import codec, oracle
from ggs_tpu.ops.render_grad import render_pallas_diff
import pytest

H, W = 32, 128


def _g9(key, B=2, N=40, max_scale=0.3):
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=max_scale)
    return codec.genome_to_renderer(g)


def test_forward_matches_oracle(key):
    g9 = _g9(key)
    a = render_pallas_diff(g9, H, W, interpret=True)
    b = oracle.render_xla(g9, H, W)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_grads_match_oracle_autodiff(key):
    g9 = _g9(key)
    tgt = jax.random.uniform(jax.random.PRNGKey(4001), (H, W, 3))

    def loss_p(g9):
        return jnp.mean((render_pallas_diff(g9, H, W, interpret=True) - tgt) ** 2)

    def loss_o(g9):
        return jnp.mean((oracle.render_xla(g9, H, W, remat_chunk=16) - tgt) ** 2)

    gp = jax.grad(loss_p)(g9)
    go = jax.grad(loss_o)(g9)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(go), rtol=1e-3, atol=1e-7)


@pytest.mark.slow
def test_grads_with_saturated_alpha(key):
    """f == 1 exactly (alpha 255, pixel at center): the division-free
    backward must stay finite where (1 - f) == 0."""
    g = jnp.array(
        [[[0.5, 0.5, jnp.log(4.0), jnp.log(4.0), 0.0, 200.0, 50.0, 30.0, 255.0],
          [0.5, 0.5, jnp.log(6.0), jnp.log(6.0), 0.3, 10.0, 220.0, 90.0, 255.0]]]
    )
    g9 = codec.genome_to_renderer(g)
    tgt = jnp.zeros((H, W, 3))

    def loss_p(g9):
        return jnp.mean((render_pallas_diff(g9, H, W, interpret=True) - tgt) ** 2)

    def loss_o(g9):
        return jnp.mean((oracle.render_xla(g9, H, W, remat_chunk=16) - tgt) ** 2)

    gp = jax.grad(loss_p)(g9)
    go = jax.grad(loss_o)(g9)
    assert np.all(np.isfinite(np.asarray(gp)))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(go), rtol=1e-3, atol=1e-7)


@pytest.mark.slow
def test_grads_match_finite_differences(key):
    """End-to-end axes-angle -> pallas render -> MSE vs central differences."""
    N = 3
    g = genome.new_population(key, 1, N, H, W, min_scale=1.0, max_scale=0.3)[0]
    tgt = jax.random.uniform(jax.random.PRNGKey(4002), (H, W, 3))

    def loss(g_axes):
        img = render_pallas_diff(codec.genome_to_renderer(g_axes), H, W, interpret=True)
        return jnp.mean((img - tgt) ** 2)

    grad = jax.grad(loss)(g)
    eps = 1e-3
    for (i, j) in [(0, 0), (0, 2), (1, 4), (1, 5), (2, 8)]:
        fd = (float(loss(g.at[i, j].add(eps))) - float(loss(g.at[i, j].add(-eps)))) / (2 * eps)
        ad = float(grad[i, j])
        assert abs(fd - ad) < 5e-3 * max(1.0, abs(fd), abs(ad)) + 2e-4, (
            f"grad mismatch at {(i, j)}: fd={fd} ad={ad}"
        )


@pytest.mark.slow
def test_more_splats_than_chunk(key):
    """cnt > backward chunk size (32): multi-chunk reverse path."""
    g9 = _g9(key, B=1, N=70, max_scale=1.0)  # huge splats -> every tile sees ~all
    tgt = jax.random.uniform(jax.random.PRNGKey(4003), (H, W, 3))

    def loss_p(g9):
        return jnp.mean((render_pallas_diff(g9, H, W, interpret=True) - tgt) ** 2)

    def loss_o(g9):
        return jnp.mean((oracle.render_xla(g9, H, W, remat_chunk=16) - tgt) ** 2)

    gp = jax.grad(loss_p)(g9)
    go = jax.grad(loss_o)(g9)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(go), rtol=2e-3, atol=1e-7)


@pytest.mark.slow
def test_chunked_passes_grads_match_oracle(monkeypatch, key):
    """Force the SMEM splat-chunking path (multiple chained custom-VJP
    passes) and check both the forward image and jax.grad against the
    unchunked oracle: the g*T_total init-canvas cotangent must chain
    exactly across passes."""
    from ggs_tpu.ops import render_pallas as rp

    H = W = 24
    g = genome.new_population(key, 1, 13, H, W, 1.0, 0.4)
    g9 = codec.genome_to_renderer(g)
    tgt = oracle.render_xla(
        codec.genome_to_renderer(
            genome.new_population(jax.random.PRNGKey(7), 1, 13, H, W, 1.0, 0.4)
        ),
        H, W,
    )

    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 5)  # 13 splats -> 3 passes

    def loss_pallas(g9):
        return jnp.mean((render_pallas_diff(g9, H, W, tile_h=8, interpret=True) - tgt) ** 2)

    def loss_oracle(g9):
        return jnp.mean((oracle.render_xla(g9, H, W) - tgt) ** 2)

    img = render_pallas_diff(g9, H, W, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(oracle.render_xla(g9, H, W)), atol=1e-6
    )
    ga = jax.grad(loss_pallas)(g9)
    gb = jax.grad(loss_oracle)(g9)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_fused_value_and_grad_matches_unfused(key):
    """The fused single-kernel loss+grad (forward + on-chip loss head +
    backward in one pallas_call, ops/render_grad.fused_value_and_grad)
    must match jax.value_and_grad of the unfused loss for every scoring
    mode (fitness.weff_denom is their shared home)."""
    import pytest

    from ggs_tpu.config import GenomeConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops.objective import Objective

    N, B = 24, 3
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=0.3)
    tgt = jax.random.uniform(jax.random.PRNGKey(4002), (H, W, 3))
    wmask = jax.random.uniform(jax.random.PRNGKey(4003), (H, W))

    for wm, boost in [(None, False), (wmask, False), (wmask, True)]:
        obj = Objective(H=H, W=W, impl="pallas", interpret=True, boost_only=boost)
        gnm = GenomeConfig(n_splats=N)
        loss_fn = gradient.make_loss_fn(obj, gnm)
        (l0, f0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(g, tgt, wm)
        fused = gradient.make_value_and_grad(obj, gnm)
        (l1, f1), g1 = fused(g, tgt, wm)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7)
        scale = float(jnp.max(jnp.abs(g0))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(g1) / scale, np.asarray(g0) / scale, atol=2e-6
        )


@pytest.mark.slow
def test_culled_fused_matches_unfused_culled(key):
    """precision="fast" through the differentiable paths (DESIGN §8d): the
    fused single-kernel loss+grad under the ε-cull must equal
    jax.value_and_grad of the unfused culled loss (both walk the same
    tightened pair lists), culling must actually engage (energies differ
    from exact), and splats culled dead (alpha <= ε) must receive exactly
    zero genome gradient."""
    from ggs_tpu.config import GenomeConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops.objective import Objective

    N, B, eps = 24, 2, 8e-2
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=0.3)
    # Force two splats per image below the cull threshold (alpha is on the
    # 0-255 genome scale; screen-space a = alpha/255, so a <= eps needs
    # alpha <= 20.4).
    g = g.at[:, :2, 8].set(5.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(4005), (H, W, 3))
    wmask = jax.random.uniform(jax.random.PRNGKey(4006), (H, W))

    gnm = GenomeConfig(n_splats=N)
    obj_fast = Objective(
        H=H, W=W, impl="pallas", interpret=True, precision="fast", cull_eps=eps
    )
    obj_exact = Objective(H=H, W=W, impl="pallas", interpret=True)

    loss_fast = gradient.make_loss_fn(obj_fast, gnm)
    (l0, f0), g0 = jax.value_and_grad(loss_fast, has_aux=True)(g, tgt, wmask)
    (l1, f1), g1 = gradient.make_value_and_grad(obj_fast, gnm)(g, tgt, wmask)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-12
    np.testing.assert_allclose(np.asarray(g1) / scale, np.asarray(g0) / scale, atol=2e-6)

    # the cull engaged: the culled energy is not the exact energy
    loss_exact = gradient.make_loss_fn(obj_exact, gnm)
    le, _ = loss_exact(g, tgt, wmask)
    assert float(l1) != float(le)
    # dead splats (a <= ε -> empty box -> never binned/walked): zero grads
    dead = np.asarray(g1)[:, :2, :]
    np.testing.assert_array_equal(dead, np.zeros_like(dead))
    # live splats still carry gradient
    assert float(np.abs(np.asarray(g1)[:, 2:, :]).max()) > 0.0


@pytest.mark.slow
def test_fused_value_and_grad_chunked_fallback(key, monkeypatch):
    """N above the SMEM chunk limit must fall back to the unfused path and
    still produce identical values/grads."""
    from ggs_tpu.config import GenomeConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops import render_pallas as rp
    from ggs_tpu.ops.objective import Objective

    monkeypatch.setattr(rp, "_MAX_SMEM_SPLATS", 8)
    N, B = 13, 2
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=0.3)
    tgt = jax.random.uniform(jax.random.PRNGKey(4004), (H, W, 3))

    obj = Objective(H=H, W=W, impl="pallas", interpret=True)
    gnm = GenomeConfig(n_splats=N)
    loss_fn = gradient.make_loss_fn(obj, gnm)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(g, tgt, None)
    (l1, _), g1 = gradient.make_value_and_grad(obj, gnm)(g, tgt, None)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-7)


@pytest.mark.slow
def test_exact_tight_grads_match_tight_oracle(key):
    """precision="exact-tight" through the differentiable paths (DESIGN
    §8e): forward equals the tight-box oracle, gradients equal the tight
    oracle's autodiff, the fused single-kernel loss+grad equals
    jax.value_and_grad of the unfused tight loss, and the tier actually
    engages (energy differs from the conservative-box energy on small
    anisotropic splats where the √2-over-tall hy bound binds)."""
    from ggs_tpu.config import GenomeConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops.objective import Objective

    N, B = 24, 2
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=0.12)
    g9 = codec.genome_to_renderer(g)
    tgt = jax.random.uniform(jax.random.PRNGKey(4010), (H, W, 3))

    # forward: tight-box pallas == tight-box oracle
    a = render_pallas_diff(g9, H, W, interpret=True, box="tight")
    b = oracle.render_xla(g9, H, W, box="tight")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # grads vs the tight oracle's autodiff
    def loss_p(g9):
        return jnp.mean(
            (render_pallas_diff(g9, H, W, interpret=True, box="tight") - tgt) ** 2
        )

    def loss_o(g9):
        return jnp.mean(
            (oracle.render_xla(g9, H, W, remat_chunk=16, box="tight") - tgt) ** 2
        )

    gp = jax.grad(loss_p)(g9)
    go = jax.grad(loss_o)(g9)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(go), rtol=1e-3, atol=1e-7)

    # Objective threading: fused == unfused, and the tier engages
    gnm = GenomeConfig(n_splats=N)
    obj_t = Objective(H=H, W=W, impl="pallas", interpret=True, precision="exact-tight")
    obj_c = Objective(H=H, W=W, impl="pallas", interpret=True)
    loss_t = gradient.make_loss_fn(obj_t, gnm)
    (l0, f0), g0 = jax.value_and_grad(loss_t, has_aux=True)(g, tgt, None)
    (l1, f1), g1 = gradient.make_value_and_grad(obj_t, gnm)(g, tgt, None)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-12
    np.testing.assert_allclose(np.asarray(g1) / scale, np.asarray(g0) / scale, atol=2e-6)
    lc, _ = gradient.make_loss_fn(obj_c, gnm)(g, tgt, None)
    assert float(l0) != float(lc)  # tight truncation differs from conservative
    assert abs(float(l0) - float(lc)) < 1e-3  # ...by a k-sigma tail strip only


@pytest.mark.slow
def test_corner_cull_grad_path(key):
    """Round-5 (r4 verdict missing #2): the rect-min corner cull through
    the differentiable paths. (a) corner binning engages and stays in the
    ε class; (b) the fused single-kernel loss+grad equals
    jax.value_and_grad of the unfused corner-culled loss; (c) a
    (tile, splat) pair culled at binning contributes EXACTLY zero
    gradient — an image cotangent supported only on a corner-culled
    tile pulls back to a zero gradient for that splat."""
    from ggs_tpu.config import GenomeConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops import render_pallas as rp
    from ggs_tpu.ops.objective import Objective

    # two tile COLUMNS: at W <= 128 (one lane-wide column) every tile
    # spans the full x-box and the rect-max reduces to the tight box's
    # y-marginal — nothing to cull
    Hc, Wc = 128, 256
    tile_h, tile_w = 32, 128
    n_tx, n_ty = Wc // tile_w, Hc // tile_h
    N, B, eps = 48, 2, 8e-2
    g = genome.new_population(key, B, N, Hc, Wc, min_scale=1.0, max_scale=0.4)
    g9 = codec.genome_to_renderer(g)
    tgt = jax.random.uniform(jax.random.PRNGKey(4020), (Hc, Wc, 3))

    # (a) + (b): Objective threading, fused == unfused under the corner cull
    gnm = GenomeConfig(n_splats=N)
    obj_corner = Objective(
        H=Hc, W=Wc, impl="pallas", interpret=True, precision="fast",
        cull_eps=eps, corner_cull=True,
    )
    obj_box = obj_corner._replace(corner_cull=False)
    loss_corner = gradient.make_loss_fn(obj_corner, gnm)
    (l0, f0), g0 = jax.value_and_grad(loss_corner, has_aux=True)(g, tgt, None)
    (l1, f1), g1 = gradient.make_value_and_grad(obj_corner, gnm)(g, tgt, None)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-12
    np.testing.assert_allclose(np.asarray(g1) / scale, np.asarray(g0) / scale, atol=2e-6)
    # engagement + tolerance class: differs from box-only fast, but barely
    (lb, fb), _ = jax.value_and_grad(
        gradient.make_loss_fn(obj_box, gnm), has_aux=True
    )(g, tgt, None)
    assert float(l0) != float(lb)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(fb), atol=2e-3)

    # (c) zero grad from culled pairs: find a pair kept by the tight box
    # but culled by the corner test, aim a cotangent at ONLY that tile.
    p = codec.preprocess(g9, Hc, Wc, 3.0)
    pt = rp._tighten_boxes(p, 3.0, eps)
    corner = rp._corner_params(pt, eps)
    idx_box, cnt_box = rp._bin_splats_dense(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, tile_h, tile_w, N
    )
    idx_c, cnt_c = rp._bin_splats_dense(
        pt.x0, pt.x1, pt.y0, pt.y1, n_tx, n_ty, tile_h, tile_w, N, corner=corner
    )
    pair = None
    for b in range(B):
        for t in range(n_tx * n_ty):
            box_set = set(np.asarray(idx_box[b, t, : int(cnt_box[b, t])]).tolist())
            cor_set = set(np.asarray(idx_c[b, t, : int(cnt_c[b, t])]).tolist())
            # a splat culled from THIS tile and not binned anywhere it
            # could pick up cotangent: restrict the check to this tile by
            # zeroing the cotangent elsewhere, so any tile works
            dropped = box_set - cor_set
            if dropped:
                pair = (b, t, sorted(dropped)[0])
                break
        if pair:
            break
    assert pair is not None, "protocol error: no corner-culled pair sampled"
    b, t, s = pair
    ty, tx = t // n_tx, t % n_tx
    cot = np.zeros((B, Hc, Wc, 3), np.float32)
    cot[b, ty * tile_h:(ty + 1) * tile_h, tx * tile_w:(tx + 1) * tile_w, :] = 1.0

    def pull(corner_on):
        _, vjp = jax.vjp(
            lambda q: render_pallas_diff(
                q, Hc, Wc, interpret=True, tile_h=tile_h, tile_w=tile_w,
                cull_eps=eps, corner_cull=corner_on,
            ),
            g9,
        )
        return np.asarray(vjp(jnp.asarray(cot))[0])

    g_on = pull(True)
    g_off = pull(False)
    np.testing.assert_array_equal(g_on[b, s], np.zeros(9, np.float32))
    assert float(np.abs(g_off[b, s]).max()) > 0.0
