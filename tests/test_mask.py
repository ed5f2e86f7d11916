"""Importance-mask tests: building blocks vs torch (behavioral parity with
modules/mask.py) and end-to-end properties (range, edge emphasis)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.ops import mask


def test_luma_rec709():
    img = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    y = mask.rgb_to_luma(img)
    np.testing.assert_allclose(np.asarray(y[0]), [0.2126, 0.7152, 0.0722], atol=1e-6)


def test_luma_rescales_255_inputs():
    img = jnp.full((4, 4, 3), 255.0)
    np.testing.assert_allclose(np.asarray(mask.rgb_to_luma(img)), 1.0, atol=1e-5)


def test_avg_pool_matches_torch(key):
    """count_include_pad semantics must match torch F.avg_pool2d defaults."""
    import torch
    import torch.nn.functional as F

    y = jax.random.uniform(key, (13, 17))
    for k, stride, pad in [(9, 1, 4), (3, 1, 1), (2, 2, 0), (4, 4, 0)]:
        got = mask._avg_pool(y, k, stride, pad)
        ref = F.avg_pool2d(
            torch.from_numpy(np.asarray(y))[None, None], k, stride=stride, padding=pad
        )[0, 0].numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6, err_msg=f"k={k}")


def test_sobel_matches_torch(key):
    import torch
    import torch.nn.functional as F

    y = jax.random.uniform(key, (11, 9))
    got = mask.sobel_edges(y)
    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]).view(1, 1, 3, 3)
    ky = torch.tensor([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]]).view(1, 1, 3, 3)
    t = torch.from_numpy(np.asarray(y))[None, None]
    gx = F.conv2d(t, kx, padding=1)
    gy = F.conv2d(t, ky, padding=1)
    ref = torch.sqrt(gx * gx + gy * gy + 1e-12)[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_local_variance_nonnegative_and_flat_zero(key):
    flat = jnp.full((16, 16), 0.5)
    # interior windows see a constant -> zero variance; borders include zero
    # padding (count_include_pad, like torch) so they are legitimately > 0
    np.testing.assert_allclose(np.asarray(mask.local_variance(flat))[4:-4, 4:-4], 0.0, atol=1e-6)
    noisy = jax.random.uniform(key, (16, 16))
    assert float(jnp.min(mask.local_variance(noisy))) >= 0.0


def test_mask_range_and_floor(key):
    H = W = 32
    target = jax.random.uniform(key, (H, W, 3))
    strength = 0.7
    m = mask.compute_importance_mask(target, H, W, smooth=3, strength=strength)
    assert m.shape == (H, W)
    # With strength s and floor f: values in [(1-s) + s*f, 1]
    lo = (1 - strength) + strength * 0.15
    assert float(jnp.min(m)) >= lo - 1e-5
    assert float(jnp.max(m)) <= 1.0 + 1e-5


def test_mask_emphasizes_edges():
    """A step edge must get higher importance than flat regions."""
    H = W = 48
    img = jnp.zeros((H, W, 3)).at[:, W // 2 :].set(1.0)
    m = mask.compute_importance_mask(img, H, W, smooth=3, strength=1.0)
    edge_band = np.asarray(m[:, W // 2 - 2 : W // 2 + 2])
    flat_band = np.asarray(m[:, 4:8])
    assert edge_band.mean() > flat_band.mean() + 0.2


def test_mask_strength_one_vs_zero(key):
    H = W = 16
    target = jax.random.uniform(key, (H, W, 3))
    m0 = mask.compute_importance_mask(target, H, W, strength=0.0)
    np.testing.assert_allclose(np.asarray(m0), 1.0, atol=1e-6)


def test_mask_resizes_target(key):
    target = jax.random.uniform(key, (37, 53, 3))
    m = mask.compute_importance_mask(target, 16, 24, smooth=3, strength=0.7)
    assert m.shape == (16, 24)
