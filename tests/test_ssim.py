"""SSIM fitness properties and the mixed MSE/SSIM objective."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.config import GenomeConfig
from ggs_tpu.models import genome
from ggs_tpu.ops import codec, objective, oracle, ssim
import pytest

H = W = 32


def test_ssim_identity_is_one(key):
    img = jax.random.uniform(key, (2, H, W, 3))
    target = img[0]
    s = ssim.ssim(img.at[0].set(target), target)
    np.testing.assert_allclose(float(s[0]), 1.0, atol=1e-5)


def test_ssim_orders_by_similarity(key):
    target = jax.random.uniform(key, (H, W, 3))
    near = jnp.clip(target + 0.02 * jax.random.normal(jax.random.fold_in(key, 1), target.shape), 0, 1)
    far = jax.random.uniform(jax.random.fold_in(key, 2), (H, W, 3))
    s = ssim.ssim(jnp.stack([near, far]), target)
    assert float(s[0]) > float(s[1])
    assert float(s[0]) > 0.5


def test_dssim_range(key):
    imgs = jax.random.uniform(key, (3, H, W, 3))
    target = jax.random.uniform(jax.random.fold_in(key, 1), (H, W, 3))
    d = ssim.dssim(imgs, target)
    assert np.all(np.asarray(d) >= 0.0) and np.all(np.asarray(d) <= 1.0)
    np.testing.assert_allclose(
        float(ssim.dssim(target[None], target)[0]), 0.0, atol=1e-5
    )


def test_ssim_differentiable(key):
    target = jax.random.uniform(key, (H, W, 3))

    def loss(x):
        return ssim.dssim(x[None], target)[0]

    x0 = jnp.clip(target + 0.1, 0, 1)
    g = jax.grad(loss)(x0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_objective_metric_modes(key):
    gnm = GenomeConfig(n_splats=6, min_scale=1.0, max_scale=0.3)
    pop = genome.new_population(key, 3, 6, H, W, gnm.min_scale, gnm.max_scale)
    target = oracle.render_xla(
        codec.genome_to_renderer(
            genome.new_population(jax.random.PRNGKey(5001), 1, 6, H, W, 1.0, 0.3)[0]
        ),
        H,
        W,
    )
    mse = objective.evaluate(objective.Objective(H=H, W=W, impl="xla"), pop, target, None)
    sse = objective.evaluate(
        objective.Objective(H=H, W=W, impl="xla", metric="ssim"), pop, target, None
    )
    mix = objective.evaluate(
        objective.Objective(H=H, W=W, impl="xla", metric="mix", ssim_weight=0.5),
        pop, target, None,
    )
    np.testing.assert_allclose(np.asarray(mix), 0.5 * np.asarray(mse) + 0.5 * np.asarray(sse), rtol=1e-5)
    assert np.all(np.asarray(sse) > 0)
