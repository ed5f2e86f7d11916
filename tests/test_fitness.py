"""Fitness modes vs independent NumPy reductions (modules/fitness.py:8-31)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.ops import fitness

from reference_impl import np_fitness


def _data(key, B=3, H=10, W=14):
    imgs = jax.random.uniform(key, (B, H, W, 3))
    target = jax.random.uniform(jax.random.fold_in(key, 1), (H, W, 3))
    w = jax.random.uniform(jax.random.fold_in(key, 2), (H, W), minval=0.2, maxval=1.0)
    return imgs, target, w


def test_plain_mse(key):
    imgs, target, _ = _data(key)
    got = fitness.fitness_from_images(imgs, target)
    ref = np_fitness(np.asarray(imgs), np.asarray(target))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)


def test_weighted_mse(key):
    imgs, target, w = _data(key)
    got = fitness.fitness_from_images(imgs, target, weight_mask=w)
    ref = np_fitness(np.asarray(imgs), np.asarray(target), np.asarray(w))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)


def test_boost_only(key):
    imgs, target, w = _data(key)
    got = fitness.fitness_from_images(imgs, target, weight_mask=w, boost_only=True, boost_beta=1.0)
    ref = np_fitness(np.asarray(imgs), np.asarray(target), np.asarray(w), boost_only=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)


def test_perfect_match_is_zero(key):
    _, target, w = _data(key)
    imgs = jnp.broadcast_to(target, (2, *target.shape))
    for kwargs in [{}, {"weight_mask": w}, {"weight_mask": w, "boost_only": True}]:
        got = fitness.fitness_from_images(imgs, target, **kwargs)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-7)


def test_uniform_mask_equals_scaled_mse(key):
    """With w == const the weighted mode is 3x the per-channel-mean MSE
    (channel-summed numerator over per-pixel denominator)."""
    imgs, target, _ = _data(key)
    w = jnp.full(target.shape[:2], 0.7)
    got = fitness.fitness_from_images(imgs, target, weight_mask=w)
    plain = fitness.fitness_from_images(imgs, target)
    np.testing.assert_allclose(np.asarray(got), 3.0 * np.asarray(plain), rtol=1e-5)
