"""Error-guided splat growth (models/grow.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GenomeConfig
from ggs_tpu.models import genome, grow
from ggs_tpu.ops import codec, objective, oracle
import pytest

H = W = 32
GNM = GenomeConfig(n_splats=8, min_scale=1.0, max_scale=0.3)
OBJ = objective.Objective(H=H, W=W, impl="xla")


def test_grow_shapes_and_painter_order(key):
    pop = genome.new_population(key, 3, 8, H, W, GNM.min_scale, GNM.max_scale)
    target = jnp.zeros((H, W, 3), jnp.float32)
    out = grow.grow_population(jax.random.PRNGKey(1), pop, 5, target, OBJ)
    assert out.shape == (3, 13, 9)
    # originals unchanged, in place (new splats appended = painted on top)
    np.testing.assert_array_equal(np.asarray(out[:, :8]), np.asarray(pop))


def test_grow_targets_high_error_pixels(key):
    """With an empty population, the residual IS the target: new splats
    must concentrate where the target is bright and copy its colors."""
    pop = genome.new_population(key, 2, 4, H, W, GNM.min_scale, GNM.max_scale)
    pop = pop.at[..., 8].set(0.0)  # fully transparent -> render = white bg
    target = jnp.ones((H, W, 3), jnp.float32)  # == bg -> residual 0...
    # ...except a dark box: |white - dark| maximal there
    target = target.at[8:16, 20:28].set(jnp.array([0.1, 0.2, 0.3]))

    out = grow.grow_population(jax.random.PRNGKey(2), pop, 16, target, OBJ)
    new = np.asarray(out[:, 4:])
    px = new[..., 0] * (W - 1)
    py = new[..., 1] * (H - 1)
    inside = (px >= 19.5) & (px <= 27.5) & (py >= 7.5) & (py <= 15.5)
    assert inside.mean() > 0.95, f"only {inside.mean():.0%} of new splats in the error box"
    np.testing.assert_allclose(new[..., 5], 0.1 * 255.0, atol=1e-4)  # r from target
    assert np.all(new[..., 8] > 0)  # visible alpha


def test_grow_samples_distinct_pixels(key):
    """Round-4 gumbel-top-k sampling: per-individual new-splat pixels are
    DISTINCT (weighted sampling without replacement). This pins the fix
    for the vmapped-categorical route, whose [P, n_new, H*W] gumbel
    tensor was a measured 8.6 GB RESOURCE_EXHAUSTED at the flagship
    recipe's 256→512 growth stage on a 512² canvas (grow.py:54)."""
    pop = genome.new_population(key, 3, 4, H, W, GNM.min_scale, GNM.max_scale)
    target = jax.random.uniform(jax.random.PRNGKey(7), (H, W, 3), jnp.float32)
    n_new = 64
    out = grow.grow_population(jax.random.PRNGKey(3), pop, n_new, target, OBJ)
    new = np.asarray(out[:, 4:])
    px = np.rint(new[..., 0] * (W - 1)).astype(int)
    py = np.rint(new[..., 1] * (H - 1)).astype(int)
    for i in range(3):
        pix = set(zip(px[i].tolist(), py[i].tolist()))
        assert len(pix) == n_new, f"individual {i}: {len(pix)}/{n_new} distinct"


@pytest.mark.slow
def test_grow_improves_fitness_headroom(key):
    """After growth, the population's best fitness must be improvable below
    the pre-growth best (the added capacity is usable): one exact check —
    fitness with the grown splats is finite and the genome stays in-domain."""
    from ggs_tpu.ops import codec as codec_mod

    pop = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    g = genome.new_population(jax.random.PRNGKey(9), 1, 8, H, W, 1.0, 0.3)[0]
    target = oracle.render_xla(codec.genome_to_renderer(g), H, W)
    out = grow.grow_population(jax.random.PRNGKey(3), pop, 8, target, OBJ)
    clamped = codec_mod.clamp_genome(out, H, W, GNM.min_scale, GNM.max_scale)
    np.testing.assert_allclose(np.asarray(clamped), np.asarray(out), atol=1e-5)
    fits = objective.evaluate(OBJ, out, target, None)
    assert np.isfinite(np.asarray(fits)).all()


def test_recycle_prunes_lowest_impact_and_keeps_shape(key):
    pop = genome.new_population(key, 2, 8, H, W, GNM.min_scale, GNM.max_scale)
    # make splat 3 clearly the least massive (tiny alpha and scale)
    pop = pop.at[:, 3, 8].set(0.01)
    pop = pop.at[:, 3, 2:4].set(jnp.log(1.0))
    target = jnp.zeros((H, W, 3), jnp.float32)
    out = grow.recycle_population(jax.random.PRNGKey(5), pop, 2, target, OBJ)
    assert out.shape == pop.shape
    # splat 3 must be gone from the survivor slots (first N-k, original order)
    surv = np.asarray(out[:, :6])
    orig = np.asarray(pop)
    for p in range(2):
        for row in surv[p]:
            assert not np.allclose(row, orig[p, 3]), "lowest-impact splat survived"
    # survivors preserve relative painter order: each survivor row appears
    # in the original, and their original indices are increasing
    for p in range(2):
        idxs = [
            int(np.argmin(np.abs(orig[p] - row).sum(axis=1))) for row in surv[p]
        ]
        assert idxs == sorted(idxs)
