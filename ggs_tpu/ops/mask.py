"""Importance mask: multi-scale edges + local variance -> per-pixel weights.

Reproduces modules/mask.py:6-83 semantics in pure JAX: Rec.709 luma,
bilinear resize of the target to the working resolution, Sobel edge
magnitude at scales (1, 2, 4) (downsample by average pooling, Sobel,
bilinear upsample, sum), 9x9 local variance via E[x^2] - E[x]^2, robust
2%/98%-quantile normalization of each cue to [0,1], a 0.7/0.3 blend,
optional box smoothing, gamma, floor, and a global strength blend with
ones. Computed once per run, so it is jitted but not performance-critical.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def _to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """Scale 0..255 inputs to 0..1, like the reference's max()>1.5 heuristic
    (modules/mask.py:7, 42)."""
    return jnp.where(jnp.max(x) > 1.5, x / 255.0, x)


def rgb_to_luma(img_hw3: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] -> [H, W] Rec.709 luma (modules/mask.py:6-10)."""
    x = _to_unit(img_hw3)
    return 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]


def _conv2d_same(y_hw: jnp.ndarray, kernel_33: jnp.ndarray) -> jnp.ndarray:
    """3x3 conv, zero padding 1 (torch F.conv2d(padding=1) semantics)."""
    lhs = y_hw[None, None]  # [1, 1, H, W]
    rhs = kernel_33[None, None]  # [1, 1, 3, 3]
    # HIGHEST: the TPU conv default is bf16 multiplies (~4e-3 error),
    # which would break the torch-parity the mask tests pin down.
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


def sobel_edges(y_hw: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude (modules/mask.py:13-18)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=y_hw.dtype)
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=y_hw.dtype)
    gx = _conv2d_same(y_hw, kx)
    gy = _conv2d_same(y_hw, ky)
    return jnp.sqrt(gx * gx + gy * gy + 1e-12)


def _avg_pool(y_hw: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """torch F.avg_pool2d with count_include_pad=True (its default): the sum
    window includes zero padding and the divisor is always k*k."""
    s = jax.lax.reduce_window(
        y_hw,
        0.0,
        jax.lax.add,
        window_dimensions=(k, k),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )
    return s / float(k * k)


def local_variance(y_hw: jnp.ndarray, k: int = 9) -> jnp.ndarray:
    """Windowed variance via E[x^2] - E[x]^2, clamped >= 0 (modules/mask.py:21-25)."""
    pad = k // 2
    mean = _avg_pool(y_hw, k, 1, pad)
    mean2 = _avg_pool(y_hw * y_hw, k, 1, pad)
    return jnp.maximum(mean2 - mean * mean, 0.0)


def _norm01(t: jnp.ndarray) -> jnp.ndarray:
    """Robust normalize by the 2%/98% quantiles (modules/mask.py:62-65)."""
    ql = jnp.quantile(t.reshape(-1), 0.02)
    qh = jnp.quantile(t.reshape(-1), 0.98)
    return jnp.clip((t - ql) / (qh - ql + 1e-12), 0.0, 1.0)


def _resize_hw(y_hw: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (= torch align_corners=False)."""
    return jax.image.resize(
        y_hw, (H, W), method="bilinear", precision=jax.lax.Precision.HIGHEST
    )


@partial(
    jax.jit,
    static_argnames=("H", "W", "edge_scales", "smooth"),
)
def compute_importance_mask(
    target_hw3: jnp.ndarray,
    H: int,
    W: int,
    edge_scales: Sequence[int] = (1, 2, 4),
    w_edge: float = 0.7,
    w_var: float = 0.3,
    gamma: float = 0.7,
    floor: float = 0.15,
    smooth: int = 0,
    strength: float = 1.0,
) -> jnp.ndarray:
    """Target image [H0, W0, 3] -> importance weights [H, W] in
    [(1-strength) + strength*floor', 1] (modules/mask.py:29-83)."""
    x = _to_unit(target_hw3.astype(jnp.float32))
    x = jax.image.resize(
        x, (H, W, 3), method="bilinear", precision=jax.lax.Precision.HIGHEST
    )
    y = rgb_to_luma(x)  # already unit scale

    edges = jnp.zeros_like(y)
    for s in edge_scales:
        if s > 1:
            yd = _avg_pool(y, s, s, 0)[: H // s, : W // s]
            e = _resize_hw(sobel_edges(yd), H, W)
        else:
            e = sobel_edges(y)
        edges = edges + e

    var = local_variance(y, k=9)

    E = _norm01(edges)
    V = _norm01(var)
    m = _norm01(w_edge * E + w_var * V)
    if smooth and smooth > 0:
        m = _norm01(_avg_pool(m, smooth, 1, smooth // 2))
    m = m**gamma
    m = (1.0 - floor) * m + floor
    # Blend with ones for global strength (reference gates on strength < 1,
    # an identity when strength == 1 — safe to apply unconditionally).
    m = (1.0 - strength) * jnp.ones_like(m) + strength * m
    return m
