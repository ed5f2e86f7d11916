"""Gradient fitting (Adam) + hybrid memetic loop (BASELINE.md configs)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GAConfig, GenomeConfig, GradConfig
from ggs_tpu.models import ga, genome, gradient
from ggs_tpu.ops import codec, objective, oracle
import pytest

H = W = 24
GNM = GenomeConfig(n_splats=8, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def _target(key):
    g = genome.new_population(key, 1, 8, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


def test_adam_reduces_loss(key):
    target = _target(jax.random.PRNGKey(3001))
    cfg = GradConfig(steps=60, lr=2e-2)
    opt, step = gradient.make_fit_step(OBJ, GNM, cfg)
    g0 = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(OBJ, GNM, cfg)
    loss_fn = gradient.make_loss_fn(OBJ, GNM)
    l0, _ = loss_fn(g0, target, None)
    state, fits = run(state, target, None, 60)
    l1, _ = loss_fn(state.g, target, None)
    assert float(l1) < float(l0) * 0.7  # solid descent on an in-model target
    # fitness trajectory is broadly decreasing
    f = np.asarray(fits).mean(axis=1)
    assert f[-1] < f[0]


def test_adam_respects_domain(key):
    target = _target(jax.random.PRNGKey(3002))
    cfg = GradConfig(steps=30, lr=5e-1)  # big steps to slam into the clamps
    opt, _ = gradient.make_fit_step(OBJ, GNM, cfg)
    g0 = genome.new_population(key, 1, 8, H, W, GNM.min_scale, GNM.max_scale)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(OBJ, GNM, cfg)
    state, _ = run(state, target, None, 30)
    g = np.asarray(state.g)
    assert g[..., 0:2].min() >= 0.0 and g[..., 0:2].max() <= 1.0
    lo, hi = np.log(GNM.min_scale), np.log(GNM.max_scale * max(H, W))
    assert g[..., 2:4].min() >= lo - 1e-5 and g[..., 2:4].max() <= hi + 1e-5
    assert g[..., 5:9].min() >= 0.0 and g[..., 5:9].max() <= 255.0


def test_fit_adam_driver(key):
    target = _target(jax.random.PRNGKey(3003))
    best, best_loss, curve = gradient.fit_adam(
        target, H, W, obj=OBJ, gnm=GNM, cfg=GradConfig(steps=40, lr=2e-2),
        seed=0, log_every=20, progress=False,
    )
    assert best.shape == (8, 9)
    assert len(curve) == 40
    assert best_loss <= curve[0]


def test_refine_elites_never_worsens(key):
    target = _target(jax.random.PRNGKey(3004))
    elites = genome.new_population(key, 3, 8, H, W, GNM.min_scale, GNM.max_scale)
    fits = objective.evaluate(OBJ, elites, target, None)
    el2, f2 = gradient.refine_elites(
        elites, fits, target, None, OBJ, GNM, GradConfig(lr=1e-2), steps=10
    )
    assert np.all(np.asarray(f2) <= np.asarray(fits) + 1e-7)
    # fits reported must match re-evaluation of the returned genomes
    f_check = objective.evaluate(OBJ, el2, target, None)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_check), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_memetic_run_block(key):
    target = _target(jax.random.PRNGKey(3005))
    cfg = GAConfig(pop_size=8, generations=20, elite_k=2, cxpb=0.2, mutpb=0.2)
    st = ga.init(key, OBJ, target, None, cfg, GNM)
    b0 = float(st.best_fit)
    run = ga.make_memetic_run_block(
        OBJ, cfg, GNM, GradConfig(lr=1e-2), refine_every=5, refine_steps=5
    )
    st, metrics = run(st, target, None, 15)
    m = np.asarray(metrics)
    assert np.all(np.diff(m[:, 0]) <= 1e-9)  # best stays monotone through refinement
    assert float(st.best_fit) <= b0


@pytest.mark.slow
def test_fast_precision_adam_reduces_exact_loss(key):
    """Adam on the ε-culled objective (precision="fast" — exact gradients
    of the culled render, DESIGN §8d) must still descend the EXACT energy
    on an in-model target, and fit_adam must report the exact final loss
    even when training ran fast."""
    obj_fast = objective.Objective(
        H=H, W=W, impl="pallas", interpret=True, precision="fast", cull_eps=8e-2
    )
    target = _target(jax.random.PRNGKey(3010))
    cfg = GradConfig(steps=60, lr=2e-2)
    opt, _ = gradient.make_fit_step(obj_fast, GNM, cfg)
    g0 = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    state = gradient.init_state(opt, g0)
    run = gradient.make_run_block(obj_fast, GNM, cfg)
    exact_loss = gradient.make_loss_fn(OBJ, GNM)
    l0, _ = exact_loss(g0, target, None)
    state, _ = run(state, target, None, 60)
    l1, _ = exact_loss(state.g, target, None)
    assert float(l1) < float(l0) * 0.8  # descent measured on the EXACT energy

    best, best_loss, _ = gradient.fit_adam(
        target, H, W, obj=obj_fast, gnm=GNM, cfg=GradConfig(steps=30, lr=2e-2),
        seed=0, log_every=15, progress=False,
    )
    # the reported loss is the exact energy of the returned genome
    want, _ = exact_loss(jnp.asarray(best)[None], target, None)
    np.testing.assert_allclose(best_loss, float(want), rtol=1e-5, atol=1e-7)


OBJ_MIX = objective.Objective(H=H, W=W, impl="xla", metric="mix", ssim_weight=0.5)


def test_loss_fn_honors_metric(key):
    """make_loss_fn must score with the SAME energy objective.evaluate
    gives the evolutionary loops for every metric (round-2 verdict #1:
    the gradient path silently pinned MSE)."""
    target = _target(jax.random.PRNGKey(3006))
    g = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    for metric in ("mse", "ssim", "mix"):
        obj = objective.Objective(H=H, W=W, impl="xla", metric=metric, ssim_weight=0.5)
        _, fits = gradient.make_loss_fn(obj, GNM)(g, target, None)
        want = objective.evaluate(obj, g, target, None)
        np.testing.assert_allclose(
            np.asarray(fits), np.asarray(want), rtol=1e-5, atol=1e-7
        )


def test_mix_gradient_matches_finite_differences(key):
    """jax.grad of the mixed MSE/SSIM energy vs central differences on a
    handful of coordinates (all 9 gene kinds represented)."""
    target = _target(jax.random.PRNGKey(3007))
    g = genome.new_population(key, 1, 8, H, W, GNM.min_scale, GNM.max_scale)
    loss_fn = gradient.make_loss_fn(OBJ_MIX, GNM)
    grad_fn = jax.grad(lambda gg: loss_fn(gg, target, None)[0])
    an = np.asarray(grad_fn(g))
    # f32 central differences carry ~2e-4 noise after the /2eps division
    # (loss ~0.1, f32 ulp ~1e-8 relative), so per-coordinate checks use
    # that as the absolute floor...
    eps = 3e-4
    for (n, c) in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (0, 8)]:
        e = jnp.zeros_like(g).at[0, n, c].set(eps)
        lp, _ = loss_fn(g + e, target, None)
        lm, _ = loss_fn(g - e, target, None)
        fd = (float(lp) - float(lm)) / (2 * eps)
        np.testing.assert_allclose(an[0, n, c], fd, rtol=2e-2, atol=4e-4)
    # ...and a full directional derivative (better signal-to-noise: sums
    # all 72 coordinates) pins the gradient as a whole.
    v = jax.random.normal(jax.random.PRNGKey(7), g.shape)
    v = v / jnp.linalg.norm(v)
    dd = float(jnp.vdot(jnp.asarray(an), v))
    epsd = 1e-3
    lp, _ = loss_fn(g + epsd * v, target, None)
    lm, _ = loss_fn(g - epsd * v, target, None)
    fd = (float(lp) - float(lm)) / (2 * epsd)
    np.testing.assert_allclose(dd, fd, rtol=2e-2, atol=2e-4)


@pytest.mark.slow
def test_mix_gradient_pallas_matches_oracle(key):
    """The custom-VJP Pallas render under the mix energy must produce the
    oracle's gradients (interpret mode on CPU)."""
    target = _target(jax.random.PRNGKey(3008))
    g = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    obj_p = OBJ_MIX._replace(impl="pallas", interpret=True)
    gx = jax.grad(lambda gg: gradient.make_loss_fn(OBJ_MIX, GNM)(gg, target, None)[0])(g)
    gp = jax.grad(lambda gg: gradient.make_loss_fn(obj_p, GNM)(gg, target, None)[0])(g)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-6)


def test_refine_elites_mix_metric_commensurate(key):
    """Memetic refinement under metric="mix" must fit AND score on the mix
    energy: the returned fits re-evaluate identically under
    objective.evaluate and never worsen (round-2 verdict: the accept test
    compared MSE-refined fits against mix-metric elite fits)."""
    target = _target(jax.random.PRNGKey(3009))
    elites = genome.new_population(key, 3, 8, H, W, GNM.min_scale, GNM.max_scale)
    fits = objective.evaluate(OBJ_MIX, elites, target, None)
    el2, f2 = gradient.refine_elites(
        elites, fits, target, None, OBJ_MIX, GNM, GradConfig(lr=1e-2), steps=10
    )
    assert np.all(np.asarray(f2) <= np.asarray(fits) + 1e-7)
    f_check = objective.evaluate(OBJ_MIX, el2, target, None)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_check), rtol=1e-5, atol=1e-6)
    # refinement actually makes progress on the mix energy too
    assert float(np.asarray(f2).min()) < float(np.asarray(fits).min())


@pytest.mark.slow
def test_refine_elites_fast_precision_commensurate(key):
    """Same bug class as the metric mismatch, reachable via
    precision="fast"/cull_eps (the recommended evolution mode, DESIGN
    §8c): refinement FITS on the exact differentiable loss, but the
    accept test and the returned fits must be scored with the GA's own
    evaluator — otherwise the ~0.5%-scale fast-vs-exact bias leaks into
    `better` and mixed energy scales re-enter GA selection."""
    from ggs_tpu.ops import render_pallas  # noqa: F401 (pallas available)

    obj_fast = objective.Objective(
        H=H, W=W, impl="pallas", precision="fast", cull_eps=8e-2,
        interpret=True,
    )
    target = _target(jax.random.PRNGKey(3011))
    elites = genome.new_population(key, 3, 8, H, W, GNM.min_scale, GNM.max_scale)
    fits = objective.evaluate(obj_fast, elites, target, None)
    el2, f2 = gradient.refine_elites(
        elites, fits, target, None, obj_fast, GNM, GradConfig(lr=1e-2), steps=10
    )
    # never worse ON THE GA'S OWN (fast) ENERGY SCALE
    assert np.all(np.asarray(f2) <= np.asarray(fits) + 1e-7)
    # the returned fits ARE the GA evaluator's numbers for the genomes
    f_check = objective.evaluate(obj_fast, el2, target, None)
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f_check), rtol=1e-5, atol=1e-6
    )
    assert float(np.asarray(f2).min()) < float(np.asarray(fits).min())


@pytest.mark.slow
def test_memetic_run_block_mix_metric(key):
    """GA + memetic refinement on the mix metric: one consistent energy
    end-to-end; best-fitness curve stays monotone."""
    target = _target(jax.random.PRNGKey(3010))
    cfg = GAConfig(pop_size=8, generations=20, elite_k=2, cxpb=0.2, mutpb=0.2)
    st = ga.init(key, OBJ_MIX, target, None, cfg, GNM)
    b0 = float(st.best_fit)
    run = ga.make_memetic_run_block(
        OBJ_MIX, cfg, GNM, GradConfig(lr=1e-2), refine_every=5, refine_steps=5
    )
    st, metrics = run(st, target, None, 15)
    m = np.asarray(metrics)
    assert np.all(np.diff(m[:, 0]) <= 1e-9)
    assert float(st.best_fit) <= b0
    # the recorded best_fit is the mix energy of the recorded best genome
    want = objective.evaluate(OBJ_MIX, st.best[None], target, None)[0]
    np.testing.assert_allclose(float(st.best_fit), float(want), rtol=1e-5, atol=1e-6)
