"""Oracle renderer vs the independent NumPy reference implementation, plus
compositing property tests (order dependence, background, padding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggs_tpu.models import genome
from ggs_tpu.ops import codec, oracle

from reference_impl import np_render


def _random_genomes(key, B, N, H, W):
    g = genome.new_population(key, B, N, H, W, min_scale=1.0, max_scale=0.3)
    return codec.genome_to_renderer(g)


@pytest.mark.parametrize("remat_chunk", [3, 8, 64])
def test_oracle_matches_numpy(key, remat_chunk):
    H, W = 24, 40
    g9 = _random_genomes(key, 3, 8, H, W)
    img = oracle.render_xla(g9, H, W, remat_chunk=remat_chunk)
    ref = np_render(np.asarray(g9), H, W)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5)


def test_oracle_single_genome_shape(key):
    H, W = 16, 16
    g9 = _random_genomes(key, 1, 4, H, W)[0]
    img = oracle.render_xla(g9, H, W)
    assert img.shape == (H, W, 3)


def test_empty_alpha_renders_background(key):
    H, W = 8, 8
    g9 = _random_genomes(key, 1, 4, H, W)
    g9 = g9.at[..., 8].set(0.0)  # fully transparent
    img = oracle.render_xla(g9, H, W, background=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(img), 1.0)
    img2 = oracle.render_xla(g9, H, W, background=(0.25, 0.5, 0.75))
    np.testing.assert_allclose(np.asarray(img2[..., 0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img2[..., 2]), 0.75, atol=1e-6)


def test_compositing_is_order_dependent(key):
    """Painter order matters: permuting splats changes the image
    (z-order is a real degree of freedom the optimizers exploit)."""
    H = W = 32
    # Two overlapping opaque splats with different colors
    mk = lambda color: [0.5, 0.5, np.log(6.0), np.log(6.0), 0.0, *color, 255.0]
    g9 = codec.genome_to_renderer(jnp.array([[mk((255.0, 0.0, 0.0)), mk((0.0, 0.0, 255.0))]])[0])
    img_ab = oracle.render_xla(g9, H, W)
    img_ba = oracle.render_xla(g9[::-1], H, W)
    center_ab = np.asarray(img_ab)[H // 2, W // 2]
    center_ba = np.asarray(img_ba)[H // 2, W // 2]
    assert center_ab[2] > center_ab[0]  # blue painted last wins
    assert center_ba[0] > center_ba[2]
    assert not np.allclose(center_ab, center_ba)


def test_noop_padding_invariance(key):
    """remat padding must not change output (alpha-0 splats are no-ops)."""
    H = W = 16
    g9 = _random_genomes(key, 2, 5, H, W)  # 5 pads to 8 with chunk 4... exercise both
    a = oracle.render_xla(g9, H, W, remat_chunk=4)
    b = oracle.render_xla(g9, H, W, remat_chunk=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_output_clamped(key):
    H = W = 8
    g9 = _random_genomes(key, 2, 6, H, W)
    img = oracle.render_xla(g9, H, W)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0


def test_gradients_match_finite_differences(key):
    """Backward exactness (BASELINE.md): autodiff grads through the full
    codec+render+MSE pipeline vs central finite differences."""
    H = W = 12
    N = 3
    g = genome.new_population(key, 1, N, H, W, min_scale=1.0, max_scale=0.4)[0]
    target = jax.random.uniform(jax.random.fold_in(key, 9), (H, W, 3))

    def loss(g_axes):
        img = oracle.render_xla(codec.genome_to_renderer(g_axes), H, W, remat_chunk=2)
        return jnp.mean((img - target) ** 2)

    grad = jax.grad(loss)(g)
    eps = 1e-3
    # Check a spread of coordinates: x, y, a_log, theta, r, alpha of splat 0/1
    for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 4), (1, 5), (2, 8)]:
        gp = g.at[i, j].add(eps)
        gm = g.at[i, j].add(-eps)
        fd = (float(loss(gp)) - float(loss(gm))) / (2 * eps)
        ad = float(grad[i, j])
        assert abs(fd - ad) < 5e-3 * max(1.0, abs(fd), abs(ad)) + 2e-4, (
            f"grad mismatch at {(i, j)}: fd={fd} ad={ad}"
        )
