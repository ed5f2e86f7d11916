"""Scale-space annealing (ops/anneal.py, docs/DESIGN.md §9c).

The load-bearing claim: blurring a splat's GENOME (covariance + sigma^2 I,
mass-conserving amplitude) renders the same image as Gaussian-blurring the
splat's rendered layer — so evaluating blurred genomes against a blurred
target is a true smoothed-landscape family, converging to the exact
objective as sigma -> 0. No reference analogue (the reference has neither
progressive nor annealing).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggs_tpu.ops import anneal, codec, oracle


@pytest.fixture
def key():
    return jax.random.PRNGKey(7)


def _one_splat(cx, cy, a_log, b_log, theta, alpha=200.0):
    return jnp.array(
        [[cx, cy, a_log, b_log, theta, 30.0, 200.0, 90.0, alpha]], jnp.float32
    )


def test_blur_genome_sigma0_is_identity(key):
    g = jax.random.uniform(key, (3, 8, 9), minval=-1.0, maxval=1.0)
    g = g.at[..., 2:4].set(jnp.abs(g[..., 2:4]) + 0.5)  # sane log-scales
    out = anneal.blur_genome_axes(g, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=1e-6)


def test_blur_genome_axes_closed_form():
    """sx -> sqrt(sx^2 + s^2) per axis, theta untouched, alpha mass-scaled."""
    g = _one_splat(0.5, 0.5, np.log(2.0), np.log(3.0), 0.7)
    s = 4.0
    out = anneal.blur_genome_axes(g, s)
    np.testing.assert_allclose(
        float(out[0, codec.ALOG]), 0.5 * np.log(4.0 + 16.0), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out[0, codec.BLOG]), 0.5 * np.log(9.0 + 16.0), rtol=1e-6
    )
    assert float(out[0, codec.THETA]) == pytest.approx(0.7)
    expect_a = 200.0 * (2.0 * 3.0) / np.sqrt((4.0 + 16.0) * (9.0 + 16.0))
    np.testing.assert_allclose(float(out[0, codec.ALPHA]), expect_a, rtol=1e-6)


@pytest.mark.parametrize("theta", [0.0, 0.9])
def test_blur_genome_matches_image_blur(theta):
    """Render(blur_genome(g)) == gaussian_blur(Render(g)) for one splat.

    One splat over a constant background is AFFINE in the weight field
    (over-blend: bg + a*w*(c-bg)), so the genome-space blur must equal the
    image-space blur up to kernel discretization. Interior-only compare
    (the image blur renormalizes edges; the genome blur has no edges) and
    a large k_sigma so AABB tail truncation is negligible."""
    H, W = 96, 128
    sigma = 3.0
    g = _one_splat(0.5, 0.5, np.log(3.0), np.log(2.0), theta)
    img = oracle.render_xla(codec.genome_to_renderer(g[None]), H, W, k_sigma=9.0)[0]
    gb = anneal.blur_genome_axes(g, sigma)
    img_genome = oracle.render_xla(
        codec.genome_to_renderer(gb[None]), H, W, k_sigma=9.0
    )[0]
    img_image = anneal.blur_image(img, sigma, radius=12)
    m = 16  # interior margin > radius
    np.testing.assert_allclose(
        np.asarray(img_genome)[m:-m, m:-m],
        np.asarray(img_image)[m:-m, m:-m],
        atol=2e-3,
    )


def test_blur_image_preserves_dc_and_smooths(key):
    flat = jnp.full((40, 56, 3), 0.37, jnp.float32)
    out = anneal.blur_image(flat, 5.0, radius=15)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)  # edges too

    noisy = jax.random.uniform(key, (40, 56, 3))
    sm = anneal.blur_image(noisy, 3.0, radius=9)
    assert float(jnp.var(sm)) < 0.25 * float(jnp.var(noisy))
    np.testing.assert_allclose(  # renormalized edges keep the mean
        float(jnp.mean(sm)), float(jnp.mean(noisy)), atol=5e-3
    )


def test_sigma_schedule():
    total, s0, frac = 1000, 8.0, 0.6
    ss = [anneal.sigma_schedule(g, total, s0, frac) for g in range(0, total, 50)]
    assert ss[0] == pytest.approx(s0)
    assert all(a >= b for a, b in zip(ss, ss[1:]))  # monotone down
    assert all(s == 0.0 for g, s in zip(range(0, total, 50), ss) if g >= frac * total)
    assert all(s == 0.0 or s > anneal.SIGMA_SNAP for s in ss)  # snap rule
    assert anneal.sigma_schedule(0, total, 0.0) == 0.0


@pytest.mark.slow
def test_ga_anneal_smoke(key):
    """Annealed GA runs end-to-end (sigma steps, rescore, final sigma=0)
    and reaches a best fitness commensurate with the plain GA's."""
    from ggs_tpu.config import GAConfig, GenomeConfig
    from ggs_tpu.models import ga
    from ggs_tpu.ops.objective import Objective

    H, W = 48, 64
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    target = np.stack(
        [0.2 + 0.6 * x / W, 0.7 - 0.4 * y / H, 0.5 + 0.0 * x], axis=-1
    )
    cfg = GAConfig(pop_size=8, elite_k=2, generations=120)
    gnm = GenomeConfig(n_splats=12)
    obj = Objective(H=H, W=W, impl="xla")

    def fit(sig0):
        _, best_fit, curves = ga.genetic_approx(
            target, H, W, obj=obj, ga=cfg, gnm=gnm, seed=3,
            log_every=30, progress=False, anneal_sigma0=sig0,
            anneal_frac=0.5,
        )
        return best_fit, curves

    bf_plain, _ = fit(0.0)
    bf_anneal, curves = fit(6.0)
    assert len(curves["best"]) == 121
    # Final phase runs at sigma=0, so both are TRUE objective values.
    assert bf_anneal < 1.5 * bf_plain + 1e-3
    assert np.isfinite(bf_anneal)


@pytest.mark.slow
def test_adam_anneal_step_backends_agree(key):
    """The blurred-loss Adam step chains gradients through the genome blur
    identically on the XLA-autodiff and custom-VJP Pallas backends."""
    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops.objective import Objective

    H, W = 32, 128
    g0 = jax.random.uniform(key, (2, 6, 9), minval=0.1, maxval=0.9)
    g0 = g0.at[..., 2:4].set(1.2).at[..., 5:].mul(255.0)
    target = jax.random.uniform(jax.random.fold_in(key, 1), (H, W, 3))
    gnm = GenomeConfig(n_splats=6)
    cfg = GradConfig(lr=1e-2)
    outs = []
    for obj in (
        Objective(H=H, W=W, impl="xla"),
        Objective(H=H, W=W, impl="pallas", interpret=True),
    ):
        opt, step = gradient.make_fit_step(obj, gnm, cfg)
        st = gradient.init_state(opt, g0)
        st2, fits = step(st, target, None, blur_sigma=jnp.float32(2.5))
        outs.append((np.asarray(st2.g), np.asarray(fits)))
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
    # Adam's first update is ~sign(grad)*lr, so near-zero gradients amplify
    # backend f32 noise; a missing blur chain rule would diverge by O(lr).
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-3)


@pytest.mark.slow
def test_adam_anneal_smoke(key):
    """Annealed fit_adam runs the full sigma schedule and ends at the true
    objective, converging comparably to plain Adam."""
    from ggs_tpu.config import GenomeConfig, GradConfig
    from ggs_tpu.models import gradient
    from ggs_tpu.ops.objective import Objective

    H, W = 40, 56
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    target = np.stack([0.3 + 0.5 * x / W, 0.6 - 0.3 * y / H, 0.5 + 0 * x], -1)
    obj = Objective(H=H, W=W, impl="xla")
    gnm = GenomeConfig(n_splats=8)
    cfg = GradConfig(lr=2e-2, steps=120)
    _, loss_plain, _ = gradient.fit_adam(
        target, H, W, obj=obj, gnm=gnm, cfg=cfg, seed=5, log_every=30,
        progress=False,
    )
    _, loss_anneal, curve = gradient.fit_adam(
        target, H, W, obj=obj, gnm=gnm, cfg=cfg, seed=5, log_every=30,
        progress=False, anneal_sigma0=5.0, anneal_frac=0.5,
    )
    assert len(curve) == 120
    assert np.isfinite(loss_anneal)
    assert loss_anneal < 1.5 * loss_plain + 1e-3
