"""SA engine tests: Metropolis behavior, both proposal modes, convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GenomeConfig, SAConfig
from ggs_tpu.models import genome, sa
from ggs_tpu.ops import codec, objective, oracle
import pytest

H = W = 20
GNM = GenomeConfig(n_splats=6, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def _target(key):
    g = genome.new_population(key, 1, 6, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


@pytest.mark.slow
def test_sa_batched_improves_and_best_monotone(key):
    target = _target(jax.random.PRNGKey(1001))
    cfg = SAConfig(iterations=30, tries_per_iter=4, t0=1e-3, proposal_mode="batched")
    st = sa.init(key, OBJ, target, None, GNM)
    b0 = float(st.best_fit)
    run = sa.make_run_block(OBJ, cfg, GNM)
    st, metrics = run(st, target, None, 30)
    m = np.asarray(metrics)  # [30, 2] best/current
    assert np.all(np.diff(m[:, 0]) <= 1e-9)  # best non-increasing
    assert m[-1, 0] < b0  # some improvement on an in-model target


def test_sa_sequential_mode(key):
    target = _target(jax.random.PRNGKey(1002))
    cfg = SAConfig(iterations=10, tries_per_iter=2, proposal_mode="sequential")
    st = sa.init(key, OBJ, target, None, GNM)
    b0 = float(st.best_fit)
    run = sa.make_run_block(OBJ, cfg, GNM)
    st, m = run(st, target, None, 10)
    assert float(st.best_fit) <= b0
    assert np.all(np.isfinite(np.asarray(m)))


def test_metropolis_always_accepts_downhill(key):
    curr = jnp.zeros((2, 9))
    prop = jnp.ones((2, 9))
    c, f, acc = sa._metropolis(key, curr, jnp.float32(1.0), prop, jnp.float32(0.5), 1e-9)
    assert bool(acc)
    np.testing.assert_allclose(np.asarray(c), 1.0)
    assert float(f) == 0.5


def test_metropolis_rejects_uphill_at_zero_temp(key):
    curr = jnp.zeros((2, 9))
    prop = jnp.ones((2, 9))
    accepted = 0
    for i in range(20):
        _, _, acc = sa._metropolis(
            jax.random.fold_in(key, i), curr, jnp.float32(0.5), prop, jnp.float32(1.0), 1e-12
        )
        accepted += int(bool(acc))
    assert accepted == 0  # dE/T astronomically large -> never accept


def test_metropolis_accepts_uphill_at_high_temp(key):
    curr = jnp.zeros((2, 9))
    prop = jnp.ones((2, 9))
    accepted = 0
    for i in range(50):
        _, _, acc = sa._metropolis(
            jax.random.fold_in(key, i), curr, jnp.float32(0.5), prop, jnp.float32(0.5001), 10.0
        )
        accepted += int(bool(acc))
    assert accepted >= 45  # exp(-tiny/10) ~ 1


def test_simulated_annealing_driver(tmp_path, key):
    target = _target(key)
    cfg = SAConfig(iterations=8, tries_per_iter=2)
    best, best_fit, curves = sa.simulated_annealing(
        target,
        H,
        W,
        obj=OBJ,
        sa=cfg,
        gnm=GNM,
        seed=0,
        log_every=4,
        loss_png_path=str(tmp_path / "sa_loss.png"),
        loss_csv_path=str(tmp_path / "sa_loss.csv"),
        progress=False,
    )
    assert best.shape == (6, 9)
    assert len(curves["best"]) == 9
    assert (tmp_path / "sa_loss.png").exists()
    assert np.isfinite(best_fit)
