"""Search-operator contracts (modules/genetic.py:8-93 semantics, SURVEY.md §7)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.models import genome, operators
import pytest


def test_tournament_prefers_lower_fitness(key):
    fits = jnp.array([5.0, 1.0, 3.0, 4.0, 2.0])
    # with k = P the winner is overwhelmingly likely the global min each time
    sel = operators.tournament_selection(key, fits, num=64, k=32)
    counts = np.bincount(np.asarray(sel), minlength=5)
    assert counts[1] >= 60  # index of fitness 1.0


def test_tournament_with_replacement_shape(key):
    fits = jnp.arange(8.0)
    sel = operators.tournament_selection(key, fits, num=100, k=2)
    assert sel.shape == (100,)
    assert int(sel.min()) >= 0 and int(sel.max()) < 8


def test_crossover_complementary(key):
    a = jnp.ones((16, 9))
    b = jnp.zeros((16, 9))
    c1, c2 = operators.crossover_uniform(key, a, b)
    # children complementary: c1 + c2 == a + b row-wise
    np.testing.assert_allclose(np.asarray(c1 + c2), 1.0)
    # whole rows swap (per-splat mask)
    rows1 = np.asarray(c1).sum(axis=1)
    assert set(np.unique(rows1)) <= {0.0, 9.0}


def test_mutation_mutates_at_least_one_gene_per_group(key):
    """The >=1-True guarantees: even with mutpb=0 every group changes
    (genetic.py:47-59)."""
    N = 32
    ind = genome.new_individual(key, N, 64, 64)
    sig = {k: 10.0 for k in ["xy", "alog", "blog", "theta", "rgb", "alpha"]}
    for trial in range(5):
        k = jax.random.fold_in(key, trial)
        out = operators.mutate_individual(k, ind, sig, mutpb=0.0, H=64, W=64,
                                          min_scale=3.0, max_scale=0.1)
        d = np.asarray(out) - np.asarray(ind)
        # the z-order swap can move rows; compare against the multiset to
        # detect "no numeric mutation anywhere" (it can't mask group changes)
        assert np.abs(d[:, 0:2]).sum() > 0  # xy group
        assert np.abs(d[:, 2:4]).sum() > 0  # ab group
        assert np.abs(d[:, 4]).sum() > 0  # theta group
        assert np.abs(d[:, 5:9]).sum() > 0  # rgba group


def test_mutation_respects_clamps(key):
    N = 64
    ind = genome.new_individual(key, N, 32, 32)
    sig = {k: 100.0 for k in ["xy", "alog", "blog", "theta", "rgb", "alpha"]}
    out = operators.mutate_individual(
        jax.random.fold_in(key, 1), ind, sig, mutpb=1.0, H=32, W=32,
        min_scale=3.0, max_scale=0.1,
    )
    o = np.asarray(out)
    assert o[:, 0:2].min() >= 0.0 and o[:, 0:2].max() <= 1.0
    lo, hi = np.log(3.0), np.log(0.1 * 32)
    assert o[:, 2:4].min() >= lo - 1e-5 and o[:, 2:4].max() <= hi + 1e-5
    assert o[:, 4].min() > -np.pi - 1e-6 and o[:, 4].max() <= np.pi + 1e-6
    assert o[:, 5:9].min() >= 0.0 and o[:, 5:9].max() <= 255.0


def test_zorder_swap_is_permutation_moving_bigger_earlier(key):
    """Swap invariant: output rows are a permutation of input rows; when a
    swap happens, the earlier index receives a strictly larger-area splat
    (genetic.py:80-91)."""
    N = 16
    swaps = 0
    for trial in range(20):
        k = jax.random.fold_in(key, trial)
        ind = genome.new_individual(k, N, 64, 64)
        out = operators._zorder_swap(jax.random.fold_in(k, 99), ind)
        a, b = np.asarray(ind), np.asarray(out)
        # permutation of rows
        a_sorted = a[np.lexsort(a.T)]
        b_sorted = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a_sorted, b_sorted)
        diff_rows = np.nonzero(np.any(a != b, axis=1))[0]
        if len(diff_rows):
            swaps += 1
            assert len(diff_rows) == 2
            i, j = diff_rows
            area = np.exp(a[:, 2]) * np.exp(a[:, 3])
            # row j (larger area) moved to position i < j
            assert area[j] > area[i]
            np.testing.assert_allclose(b[i], a[j])
            np.testing.assert_allclose(b[j], a[i])
    assert swaps > 0  # the operator actually fires


@pytest.mark.slow
def test_mutate_population_vmap_matches_individual(key):
    pop = genome.new_population(key, 4, 8, 32, 32)
    sig = {k: 0.1 for k in ["xy", "alog", "blog", "theta", "rgb", "alpha"]}
    out = operators.mutate_population(key, pop, sig, 0.5, 32, 32, 3.0, 0.1)
    keys = jax.random.split(key, 4)
    for i in range(4):
        ref = operators.mutate_individual(keys[i], pop[i], sig, 0.5, 32, 32, 3.0, 0.1)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=1e-6)
