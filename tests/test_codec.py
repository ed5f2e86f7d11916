"""Codec unit tests: axes-angle <-> Cholesky round trips, clamp/wrap
semantics, AABB/culling bounds (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from ggs_tpu.ops import codec

from reference_impl import np_axes_angle_to_cholesky


def test_wrap_angle_range_and_values():
    th = jnp.linspace(-10.0, 10.0, 101)
    w = codec.wrap_angle(th)
    assert jnp.all(w > -jnp.pi - 1e-6) and jnp.all(w <= jnp.pi + 1e-6)
    # Same wrap as the reference formula
    expected = (np.asarray(th) + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(np.asarray(w), expected, atol=1e-6)


def test_cholesky_matches_numpy_reference(key):
    a_log = jax.random.normal(key, (64,)) * 1.5
    b_log = jax.random.normal(jax.random.fold_in(key, 1), (64,)) * 1.5
    theta = jax.random.uniform(jax.random.fold_in(key, 2), (64,), minval=-3.14, maxval=3.14)
    la, lb, lc = codec.axes_angle_to_cholesky(a_log, b_log, theta)
    na, nb, nc = np_axes_angle_to_cholesky(
        np.asarray(a_log), np.asarray(b_log), np.asarray(theta)
    )
    np.testing.assert_allclose(np.asarray(la), na, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb), nb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lc), nc, rtol=1e-4, atol=1e-4)


def test_cholesky_reconstructs_covariance(key):
    """L L^T must equal the rotated covariance built directly from axes+angle."""
    a_log = jnp.array([0.5, 1.0, 2.0])
    b_log = jnp.array([1.5, 0.2, 2.0])
    theta = jnp.array([0.3, -1.2, 0.0])
    la, lb, lc = codec.axes_angle_to_cholesky(a_log, b_log, theta)
    l11, l22, l21 = jnp.exp(la), jnp.exp(lb), lc
    # Sigma from L
    sxx = l11**2
    sxy = l11 * l21
    syy = l21**2 + l22**2
    # Sigma direct: R diag(sx^2, sy^2) R^T
    sx2, sy2 = jnp.exp(a_log) ** 2, jnp.exp(b_log) ** 2
    c, s = jnp.cos(theta), jnp.sin(theta)
    np.testing.assert_allclose(np.asarray(sxx), np.asarray(sx2 * c**2 + sy2 * s**2), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sxy), np.asarray((sx2 - sy2) * s * c), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(syy), np.asarray(sx2 * s**2 + sy2 * c**2), rtol=1e-4)


def test_preprocess_precision_inverts_covariance(key):
    """Sigma^-1 from preprocess must invert Sigma = L L^T."""
    g9 = jnp.array([[0.5, 0.5, jnp.log(3.0), jnp.log(2.0), 0.8, 100.0, 50.0, 25.0, 200.0]])
    p = codec.preprocess(g9, 64, 64, 3.0)
    l11, l22, l21 = 3.0, 2.0, 0.8
    Sig = np.array([[l11**2, l11 * l21], [l11 * l21, l21**2 + l22**2]])
    Prec = np.array(
        [[float(p.sxx[0]), float(p.sxy[0])], [float(p.sxy[0]), float(p.syy[0])]]
    )
    np.testing.assert_allclose(Prec @ Sig, np.eye(2), atol=1e-5)


def test_preprocess_aabb_and_scaling():
    H, W, k = 48, 64, 3.0
    g9 = jnp.array([[0.5, 0.5, jnp.log(2.0), jnp.log(2.0), 0.0, 255.0, 0.0, 0.0, 255.0]])
    p = codec.preprocess(g9, H, W, k)
    assert float(p.cx[0]) == 0.5 * (W - 1)
    assert float(p.cy[0]) == 0.5 * (H - 1)
    # hx = k*2 = 6 -> AABB [cx-6, cx+6] clamped/floored
    assert int(p.x0[0]) == int(np.floor(0.5 * (W - 1) - 6))
    assert int(p.x1[0]) == int(np.ceil(0.5 * (W - 1) + 6))
    # colors to unit scale
    assert float(p.rc[0]) == 1.0 and float(p.a[0]) == 1.0
    # AABB always inside the canvas
    assert 0 <= int(p.x0[0]) <= int(p.x1[0]) <= W - 1
    assert 0 <= int(p.y0[0]) <= int(p.y1[0]) <= H - 1


def test_weight_outside_aabb_is_negligible(key):
    """Culled mass bound: any pixel outside the k-sigma AABB has true weight
    <= alpha * exp(-k^2/2) (the AABB is conservative)."""
    H = W = 64
    k_sigma = 3.0
    g = jax.random.uniform(key, (32, 9))
    g = g.at[:, 2:4].set(jax.random.uniform(key, (32, 2), minval=0.3, maxval=2.0))
    g = g.at[:, 4].set(jax.random.normal(jax.random.fold_in(key, 3), (32,)))
    g = g.at[:, 5:9].set(255.0)
    p = codec.preprocess(g, H, W, k_sigma)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for i in range(32):
        qx = xs - float(p.cx[i])
        qy = ys - float(p.cy[i])
        quad = (
            float(p.sxx[i]) * qx * qx
            + 2 * float(p.sxy[i]) * qx * qy
            + float(p.syy[i]) * qy * qy
        )
        f = np.exp(-0.5 * quad) * float(p.a[i])
        outside = ~(
            (xs >= float(p.x0[i]))
            & (xs <= float(p.x1[i]))
            & (ys >= float(p.y0[i]))
            & (ys <= float(p.y1[i]))
        )
        # Interior-of-canvas AABBs bound the Gaussian mass; clamped edges may
        # truncate, so only assert where the AABB was not canvas-clamped.
        if (
            float(p.x0[i]) > 0
            and float(p.y0[i]) > 0
            and float(p.x1[i]) < W - 1
            and float(p.y1[i]) < H - 1
        ):
            assert f[outside].max() <= float(p.a[i]) * np.exp(-(k_sigma**2) / 2.0) + 1e-6


def test_clamp_genome_bounds():
    H, W = 64, 128
    min_scale, max_scale = 3.0, 0.1
    g = jnp.array(
        [[-1.0, 2.0, -100.0, 100.0, 7.0, -5.0, 300.0, 128.0, 999.0]] * 3
    )
    c = codec.clamp_genome(g, H, W, min_scale, max_scale)
    lo, hi = np.log(3.0), np.log(0.1 * 128)
    assert float(c[0, 0]) == 0.0 and float(c[0, 1]) == 1.0
    np.testing.assert_allclose(float(c[0, 2]), lo, rtol=1e-6)
    np.testing.assert_allclose(float(c[0, 3]), hi, rtol=1e-6)
    assert -np.pi < float(c[0, 4]) <= np.pi
    assert float(c[0, 5]) == 0.0 and float(c[0, 6]) == 255.0 and float(c[0, 8]) == 255.0


def test_genome_to_renderer_clamps_colors(key):
    g = jax.random.normal(key, (4, 8, 9)) * 300.0
    r = codec.genome_to_renderer(g)
    assert r.shape == (4, 8, 9)
    assert float(jnp.min(r[..., 5:9])) >= 0.0
    assert float(jnp.max(r[..., 5:9])) <= 255.0
    # xy passthrough
    np.testing.assert_allclose(np.asarray(r[..., :2]), np.asarray(g[..., :2]))


def test_scale_genome_pixels_anisotropic():
    g = jnp.zeros((4, 9)).at[:, 2].set(1.0).at[:, 3].set(2.0)
    out = codec.scale_genome_pixels_anisotropic(g, sH=2.0, sW=4.0)
    np.testing.assert_allclose(np.asarray(out[:, 2]), 1.0 + np.log(4.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 3]), 2.0 + np.log(2.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), 0.0)


def test_choose_work_size():
    # Longer side is scaled to max_side exactly, even upscaling (resize.py:6-13)
    assert codec.choose_work_size(100, 200, 512) == (256, 512)
    assert codec.choose_work_size(200, 100, 512) == (512, 256)
    assert codec.choose_work_size(512, 512, 128) == (128, 128)
