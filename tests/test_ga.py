"""GA engine tests: seeded micro-runs with monotone best fitness and
convergence on splat-representable targets (SURVEY.md §4 golden-behavior)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GAConfig, GenomeConfig
from ggs_tpu.models import ga, genome
from ggs_tpu.ops import codec, objective, oracle
import pytest

H = W = 24
GNM = GenomeConfig(n_splats=8, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def _target(key):
    """A splat-rendered target: trivially representable, GA must make progress."""
    g = genome.new_population(key, 1, 8, H, W, GNM.min_scale, GNM.max_scale)[0]
    return oracle.render_xla(codec.genome_to_renderer(g), H, W)


@pytest.mark.slow
def test_ga_best_monotone_and_improves(key):
    target = _target(jax.random.PRNGKey(1007))
    cfg = GAConfig(pop_size=8, generations=40, elite_k=2, cxpb=0.3, mutpb=0.2)
    st = ga.init(key, OBJ, target, None, cfg, GNM)
    init_best = float(st.best_fit)
    run = ga.make_run_block(OBJ, cfg, GNM)
    st, metrics = run(st, target, None, 40)
    m = np.asarray(metrics)  # [40, 4] best/mean/median/no_improve
    # best curve is non-increasing
    assert np.all(np.diff(m[:, 0]) <= 1e-9)
    # meaningful improvement on an in-model target
    assert m[-1, 0] < init_best * 0.9
    # mean >= best always
    assert np.all(m[:, 1] >= m[:, 0] - 1e-7)


@pytest.mark.slow
def test_ga_elites_preserved(key):
    """Elite carry-over: pop best fitness never regresses between generations."""
    target = _target(jax.random.PRNGKey(1003))
    cfg = GAConfig(pop_size=8, generations=20, elite_k=2, cxpb=0.2, mutpb=0.3)
    st = ga.init(key, OBJ, target, None, cfg, GNM)
    sig_max = {"xy": 0.1, "alog": 0.5, "blog": 0.5, "theta": 0.3, "rgb": 25.0, "alpha": 25.0}
    sig_min = {"xy": 0.01, "alog": 0.05, "blog": 0.05, "theta": 0.025, "rgb": 2.0, "alpha": 2.0}
    prev_min = float(jnp.min(st.fits))
    for _ in range(5):
        st, _ = ga.step(st, OBJ, target, None, cfg, GNM, sig_max, sig_min)
        cur_min = float(jnp.min(st.fits))
        assert cur_min <= prev_min + 1e-7
        prev_min = cur_min


@pytest.mark.slow
def test_ga_deterministic_given_seed(key):
    target = _target(jax.random.PRNGKey(1005))
    cfg = GAConfig(pop_size=4, generations=10, elite_k=1)
    run = ga.make_run_block(OBJ, cfg, GNM)
    st1 = ga.init(key, OBJ, target, None, cfg, GNM)
    st1, m1 = run(st1, target, None, 10)
    st2 = ga.init(key, OBJ, target, None, cfg, GNM)
    st2, m2 = run(st2, target, None, 10)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(st1.pop), np.asarray(st2.pop))


def test_ga_reeval_elites_mode(key):
    target = _target(jax.random.PRNGKey(1006))
    cfg = GAConfig(pop_size=4, generations=10, elite_k=1, reeval_elites=True)
    st = ga.init(key, OBJ, target, None, cfg, GNM)
    run = ga.make_run_block(OBJ, cfg, GNM)
    st, m = run(st, target, None, 5)
    assert np.all(np.isfinite(np.asarray(m)))


@pytest.mark.slow
def test_genetic_approx_driver(tmp_path, key):
    """End-to-end host driver: curves, CSV, PNG artifacts."""
    target = _target(key)
    cfg = GAConfig(pop_size=4, generations=8, elite_k=1)
    best, best_fit, curves = ga.genetic_approx(
        target,
        H,
        W,
        obj=OBJ,
        ga=cfg,
        gnm=GNM,
        seed=0,
        log_every=4,
        loss_png_path=str(tmp_path / "loss.png"),
        loss_csv_path=str(tmp_path / "loss.csv"),
        save_video=True,
        frame_every=4,
        video_dir=str(tmp_path / "frames"),
        progress=False,
    )
    assert best.shape == (8, 9)
    assert len(curves["best"]) == 9  # init + 8 generations
    assert (tmp_path / "loss.png").exists()
    assert (tmp_path / "loss.csv").exists()
    assert len(list((tmp_path / "frames").iterdir())) >= 1
    assert best_fit <= curves["best"][0]


def test_init_pop_warm_start(key):
    """ga.init with init_pop reuses the given population (re-clamped to the
    new resolution's domain) instead of sampling, and evaluates it."""
    import numpy as np

    from ggs_tpu.ops import codec

    cfg = GAConfig(pop_size=8, generations=10, elite_k=2)
    pop0 = genome.new_population(key, cfg.pop_size, GNM.n_splats, H, W, GNM.min_scale, GNM.max_scale)
    # push scales out of the domain of a smaller canvas to exercise re-clamp
    pop_big = pop0.at[..., 2].add(3.0)
    target = _target(jax.random.PRNGKey(77))

    st = ga.init(jax.random.PRNGKey(1), OBJ, target, None, cfg, GNM, init_pop=pop_big)
    clamped = codec.clamp_genome(pop_big, H, W, GNM.min_scale, GNM.max_scale)
    np.testing.assert_array_equal(np.asarray(st.pop), np.asarray(clamped))
    assert float(st.best_fit) == float(st.fits.min())


def test_stall_patience_ends_run_early(tmp_path, key):
    """stall_patience must end the run once the on-device no_improve
    counter crosses it at a block boundary (the --grow-auto stage
    trigger). A constant target that the tiny population can't improve on
    for long stalls almost immediately; the driver must stop well short
    of the 200-generation budget. patience=1 fires at the first block
    boundary where any generation failed to improve the best."""
    import jax.numpy as jnp

    target = jnp.zeros((H, W, 3), jnp.float32)  # all-black: stalls fast
    cfg = GAConfig(pop_size=4, generations=200, elite_k=1)
    _, _, curves = ga.genetic_approx(
        target,
        H,
        W,
        obj=OBJ,
        ga=cfg,
        gnm=GNM,
        seed=3,
        log_every=10,
        loss_png_path=str(tmp_path / "loss.png"),
        loss_csv_path=str(tmp_path / "loss.csv"),
        progress=False,
        stall_patience=1,
    )
    gens_run = len(curves["best"]) - 1  # first entry is the init eval
    assert gens_run < 200, gens_run
    assert gens_run >= 10  # full blocks only


@pytest.mark.slow
def test_explicit_weight_mask_override(tmp_path, key):
    """genetic_approx(weight_mask=...) must use the caller's mask instead
    of computing one (the --fixed-mask progressive path). A mask that
    zeroes the right half makes right-half-only error free, so the best
    energy differs from the computed-mask run on the same seed."""
    import jax.numpy as jnp

    target = _target(key)
    cfg = GAConfig(pop_size=4, generations=12, elite_k=1)
    half = jnp.concatenate(
        [jnp.ones((H, W // 2)), jnp.zeros((H, W // 2))], axis=1
    )
    kw = dict(
        obj=OBJ, ga=cfg, gnm=GNM, seed=5, log_every=6,
        loss_png_path=str(tmp_path / "l.png"),
        loss_csv_path=str(tmp_path / "l.csv"), progress=False,
    )
    _, fit_half, _ = ga.genetic_approx(target, H, W, weight_mask=half, **kw)
    _, fit_auto, _ = ga.genetic_approx(target, H, W, **kw)
    assert fit_half != fit_auto


@pytest.mark.slow
def test_recycle_on_stall(tmp_path, key, monkeypatch):
    """recycle_patience must trigger recycle_population when the best
    fitness stalls (and reset the counter so the trigger re-arms), without
    requiring a periodic cadence."""
    import jax.numpy as jnp

    from ggs_tpu.models import grow

    calls = {"n": 0}
    real = grow.recycle_population

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(grow, "recycle_population", spy)

    target = jnp.zeros((H, W, 3), jnp.float32)  # stalls almost immediately
    cfg = GAConfig(pop_size=4, generations=60, elite_k=1)
    ga.genetic_approx(
        target, H, W, obj=OBJ, ga=cfg, gnm=GNM, seed=3, log_every=10,
        loss_png_path=str(tmp_path / "l.png"),
        loss_csv_path=str(tmp_path / "l.csv"), progress=False,
        recycle_k=1, recycle_patience=1,
    )
    assert calls["n"] >= 1
