"""Gradient fitting (Adam) + hybrid memetic loop (BASELINE.md configs)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GAConfig, GenomeConfig, GradConfig
from ggs_tpu.models import ga, genome, gradient
from ggs_tpu.ops import codec, objective, oracle

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
