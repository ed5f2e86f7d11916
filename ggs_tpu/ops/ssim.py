"""SSIM: structural-similarity fitness (new capability).

The reference scores candidates with masked MSE only (modules/fitness.py);
BASELINE.md's north star asks for fused MSE/SSIM fitness. This is the
standard Wang et al. SSIM with an 11x11 Gaussian window (sigma 1.5),
K1=0.01, K2=0.03, dynamic range 1.0, computed per channel and averaged —
pure JAX, differentiable, vmappable over candidate batches.

Exposed as energies (lower = better) compatible with the optimizers:
    dssim(imgs, target) = (1 - mean SSIM) / 2  in [0, 1]
    mixed(imgs, target, w) = (1 - w) * MSE-energy + w * DSSIM
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_K1 = 0.01
_K2 = 0.03


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2(img_bhwc: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' convolution with a 2D window.

    precision=HIGHEST is load-bearing on TPU: the default conv runs bf16
    multiplies (~4e-3 absolute error at unit scale), which made the
    E[x^2] - mu^2 variance estimates negative enough to flip the SSIM
    denominator's sign — an optimizer then EXPLOITS the pole and drives
    the 'energy' to arbitrary negative values (observed: a GA reaching
    mixed energy -7 with SSIM 43).
    """
    B, H, W, C = img_bhwc.shape
    lhs = jnp.transpose(img_bhwc, (0, 3, 1, 2)).reshape(B * C, 1, H, W)
    rhs = win[None, None]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
    )
    Ho, Wo = out.shape[-2:]
    return jnp.transpose(out.reshape(B, C, Ho, Wo), (0, 2, 3, 1))


def ssim(
    imgs: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """imgs [B, H, W, 3], target [H, W, 3] -> mean SSIM [B] in [-1, 1].

    Variance estimates are clamped to >= 0 inside _ssim_map: true variances
    are nonnegative, and the residual f32 cancellation otherwise let the
    SSIM denominator cross zero (the pole a GA then exploits)."""
    win = _gaussian_window(window_size, sigma)
    t = jnp.broadcast_to(target[None], imgs.shape)
    s = _ssim_map(imgs, t, win, data_range)
    return jnp.mean(s, axis=(1, 2, 3))


def _ssim_map(imgs: jnp.ndarray, t: jnp.ndarray, win: jnp.ndarray, data_range: float):
    """Per-window-position SSIM map [B, Ho, Wo, C] (valid positions)."""
    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2
    mu_x = _filter2(imgs, win)
    mu_y = _filter2(t, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sig_xx = jnp.maximum(_filter2(imgs * imgs, win) - mu_xx, 0.0)
    sig_yy = jnp.maximum(_filter2(t * t, win) - mu_yy, 0.0)
    sig_xy = _filter2(imgs * t, win) - mu_xy
    return ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sig_xx + sig_yy + c2)
    )


def ssim_sum_rows(
    imgs_ext: jnp.ndarray,
    target_ext: jnp.ndarray,
    y0,
    H: int,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Row-slab SSIM partial: sum of the SSIM map over this slab's valid
    window rows -> [B].

    The tile-sharded building block (ops/objective._evaluate_metric_sharded):
    `imgs_ext`/`target_ext` hold the device's `rows` owned canvas rows PLUS
    `window_size - 1` halo rows below (the image halo arrives by ppermute
    from the next device; the target's comes from a replicated padded
    slice). The valid conv then yields exactly `rows` output rows, of which
    row r is globally valid iff y0 + r <= H - window_size — rows past that
    (only the bottom device has any) are masked before the sum, so
    psum(partials) / ((H-w+1)(W-w+1)C) equals the unsharded mean SSIM
    exactly (window sums never cross a slab boundary thanks to the halo).
    """
    win = _gaussian_window(window_size, sigma)
    t = jnp.broadcast_to(target_ext[None], imgs_ext.shape)
    s = _ssim_map(imgs_ext, t, win, data_range)  # [B, rows, W-w+1, C]
    rows = s.shape[1]
    valid = (jnp.arange(rows) + y0) <= (H - window_size)
    return jnp.sum(s * valid[None, :, None, None], axis=(1, 2, 3))


def dssim(imgs: jnp.ndarray, target: jnp.ndarray, **kw) -> jnp.ndarray:
    """Structural dissimilarity energy in [0, 1]; 0 iff images identical."""
    return (1.0 - ssim(imgs, target, **kw)) / 2.0


def mixed_energy(
    imgs: jnp.ndarray,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray] = None,
    ssim_weight: float = 0.5,
    boost_only: bool = False,
    boost_beta: float = 1.0,
) -> jnp.ndarray:
    """(1 - w) * masked-MSE + w * DSSIM — the fused MSE/SSIM objective."""
    from . import fitness as fitness_mod

    mse = fitness_mod.fitness_from_images(
        imgs, target, weight_mask=weight_mask, boost_only=boost_only, boost_beta=boost_beta
    )
    if ssim_weight <= 0.0:
        return mse
    d = dssim(imgs, target)
    return (1.0 - ssim_weight) * mse + ssim_weight * d
