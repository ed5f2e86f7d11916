"""Parallel-tempering SA (models/pt.py): ladder, swaps, convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GenomeConfig, SAConfig
from ggs_tpu.models import genome, pt
from ggs_tpu.ops import codec, objective, oracle
import pytest

H = W = 16
GNM = GenomeConfig(n_splats=6, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def _target(key):
    g = genome.new_population(key, 1, 6, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


def test_temp_ladder_geometric():
    t = np.asarray(pt.temp_ladder(1e-3, 1e-1, 5))
    assert t[0] == np.float32(1e-3)
    np.testing.assert_allclose(t[-1], 1e-1, rtol=1e-5)
    ratios = t[1:] / t[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)


@pytest.mark.slow
def test_pt_improves_and_best_is_monotone(key):
    target = _target(jax.random.PRNGKey(501))
    sa_cfg = SAConfig(iterations=300, t0=1e-3)
    st = pt.init(jax.random.PRNGKey(0), OBJ, target, None, GNM, 6, 1e-3, 1e-1)
    run = pt.make_run_block(OBJ, sa_cfg, GNM, swap_every=5)
    best0 = float(st.best_fit)
    st, metrics = run(st, target, None, 150)
    m = np.asarray(metrics)
    assert np.all(np.diff(m[:, 0]) <= 1e-9), "best must be monotone"
    assert float(st.best_fit) < best0, "PT should improve on the init"
    assert np.isfinite(m).all()


@pytest.mark.slow
def test_pt_swap_preserves_multiset(key):
    """Swaps permute (genome, fitness) pairs across slots: after any number
    of steps the fits stay consistent with re-evaluating the genomes."""
    target = _target(jax.random.PRNGKey(502))
    sa_cfg = SAConfig(iterations=100, t0=1e-3)
    st = pt.init(jax.random.PRNGKey(1), OBJ, target, None, GNM, 4, 1e-3, 1e-1)
    run = pt.make_run_block(OBJ, sa_cfg, GNM, swap_every=2)
    st, _ = run(st, target, None, 20)
    fits_re = objective.evaluate(OBJ, st.reps, target, None)
    np.testing.assert_allclose(np.asarray(st.reps.shape), (4, 6, 9))
    np.testing.assert_allclose(np.asarray(fits_re), np.asarray(st.fits), rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_pt_driver_smoke(tmp_path, key):
    """simulated_annealing(replicas>1) end-to-end through the host driver."""
    from ggs_tpu.models import sa as sa_mod

    target = np.asarray(_target(jax.random.PRNGKey(503)))
    best, best_fit, curves = sa_mod.simulated_annealing(
        target, H, W, obj=OBJ, sa=SAConfig(iterations=60, t0=1e-3), gnm=GNM,
        seed=3, log_every=30, progress=False, replicas=4, swap_every=5,
        loss_png_path="", loss_csv_path="",
    )
    assert best.shape == (6, 9)
    assert np.isfinite(best_fit)
    assert len(curves["best"]) >= 60
