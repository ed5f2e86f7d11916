"""Population-init distribution tests (modules/population.py:6-46 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.models import genome


def test_population_shape_and_domains(key):
    H, W = 64, 96
    pop = genome.new_population(key, 8, 128, H, W, min_scale=3.0, max_scale=0.1)
    assert pop.shape == (8, 128, 9)
    assert pop.dtype == jnp.float32
    p = np.asarray(pop)
    assert p[..., 0:2].min() >= 0.0 and p[..., 0:2].max() <= 1.0
    s_lo, s_hi = np.log(3.0), np.log(0.1 * 96)
    assert p[..., 2:4].min() >= s_lo - 1e-5 and p[..., 2:4].max() <= s_hi + 1e-5
    assert p[..., 4].min() >= -np.pi and p[..., 4].max() <= np.pi
    assert p[..., 5:8].min() >= 0.0 and p[..., 5:8].max() <= 255.0
    assert p[..., 8].min() >= 180.0 and p[..., 8].max() <= 255.0  # opaque-biased init


def test_beta_scale_means_ordered(key):
    """a-axis uses Beta m=0.4, b-axis m=0.6: mean(linear sigma_b) > mean(sigma_a)."""
    pop = genome.new_population(key, 16, 256, 64, 64, min_scale=3.0, max_scale=0.1)
    sa = np.exp(np.asarray(pop[..., 2])).mean()
    sb = np.exp(np.asarray(pop[..., 3])).mean()
    assert sb > sa


def test_new_individual(key):
    ind = genome.new_individual(key, 32, 48, 48)
    assert ind.shape == (32, 9)


def test_anneal_factor_schedules():
    for kind in ["cosine", "linear", "exp"]:
        f0 = float(genome.anneal_factor(0, 100, kind))
        f_half = float(genome.anneal_factor(50, 100, kind))
        f1 = float(genome.anneal_factor(100, 100, kind))
        assert f0 == 1.0 or abs(f0 - 1.0) < 1e-6
        assert f1 < f_half < f0
    # exact values
    np.testing.assert_allclose(float(genome.anneal_factor(50, 100, "cosine")), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(genome.anneal_factor(50, 100, "linear")), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(genome.anneal_factor(100, 100, "exp")), 0.2, rtol=1e-4)
    # unknown kind falls back to linear
    np.testing.assert_allclose(float(genome.anneal_factor(25, 100, "nope")), 0.75, atol=1e-6)


def test_build_mut_sigma_lerp():
    smax = {"xy": 0.1, "alog": 0.5}
    smin = {"xy": 0.01, "alog": 0.05}
    sig = genome.build_mut_sigma(50, 100, "linear", smax, smin)
    np.testing.assert_allclose(float(sig["xy"]), 0.01 + 0.5 * 0.09, rtol=1e-5)
    sig_end = genome.build_mut_sigma(100, 100, "linear", smax, smin)
    np.testing.assert_allclose(float(sig_end["alog"]), 0.05, rtol=1e-5)


def test_temp_schedules():
    T0 = 1e-3
    for kind in ["exp", "linear", "cosine", "log", "cauchy"]:
        t_start = float(genome.temp_schedule(kind, T0, 0, 1000))
        t_end = float(genome.temp_schedule(kind, T0, 1000, 1000))
        assert t_end < t_start
        assert t_end >= 0.0
    # exp hits T0 * 0.01 at the end
    np.testing.assert_allclose(
        float(genome.temp_schedule("exp", T0, 1000, 1000)), T0 * 0.01, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(genome.temp_schedule("cauchy", T0, 9, 1000)), T0 / 10.0, rtol=1e-5
    )
