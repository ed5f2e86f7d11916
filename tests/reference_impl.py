"""Independent NumPy implementations of the reference semantics, used as
test oracles. Written directly from the math documented in SURVEY.md
§2.1/§3.3 (plain per-pixel loops, no tiling) — deliberately naive so they
cannot share bugs with the vectorized JAX/Pallas implementations.
"""
from __future__ import annotations

import numpy as np


def np_axes_angle_to_cholesky(a_log, b_log, theta):
    sx, sy = np.exp(a_log), np.exp(b_log)
    c, s = np.cos(theta), np.sin(theta)
    sxx = sx**2 * c**2 + sy**2 * s**2
    sxy = (sx**2 - sy**2) * s * c
    syy = sx**2 * s**2 + sy**2 * c**2
    l11 = np.sqrt(np.maximum(sxx, 1e-12))
    l21 = sxy / l11
    l22 = np.sqrt(np.maximum(syy - l21 * l21, 1e-12))
    return np.log(l11), np.log(l22), l21


def np_render(g9, H, W, k_sigma=3.0, bg=(1.0, 1.0, 1.0)):
    """Renderer-format genomes [B, N, 9] -> [B, H, W, 3], painter-order
    'over' compositing on a white canvas with k-sigma AABB masking."""
    g9 = np.asarray(g9, np.float32)
    if g9.ndim == 2:
        g9 = g9[None]
    B, N, _ = g9.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    out = np.empty((B, H, W, 3), np.float32)
    for b in range(B):
        C = np.broadcast_to(np.asarray(bg, np.float32), (H, W, 3)).copy()
        for i in range(N):
            x, y, al, bl, l21, r, g, bb, a = [np.float32(v) for v in g9[b, i]]
            maxx, maxy = np.float32(W - 1), np.float32(H - 1)
            cx = np.clip(x, 0, 1) * maxx
            cy = np.clip(y, 0, 1) * maxy
            l11 = max(np.exp(al), np.float32(1e-6))
            l22 = max(np.exp(bl), np.float32(1e-6))
            hx = max(k_sigma * abs(l11), 1.0)
            hy = max(k_sigma * (abs(l21) + abs(l22)), 1.0)
            x0 = np.floor(np.clip(cx - hx, 0, maxx))
            x1 = np.ceil(np.clip(cx + hx, 0, maxx))
            y0 = np.floor(np.clip(cy - hy, 0, maxy))
            y1 = np.ceil(np.clip(cy + hy, 0, maxy))
            inv11 = 1.0 / l11
            inv22 = 1.0 / l22
            inv21 = -l21 * inv11 * inv22
            sxx = inv11 * inv11 + inv21 * inv21
            sxy = inv21 * inv22
            syy = inv22 * inv22
            qx = xs - cx
            qy = ys - cy
            quad = sxx * qx * qx + 2 * sxy * qx * qy + syy * qy * qy
            f = np.exp(-0.5 * quad) * (np.clip(a, 0, 255) / 255.0)
            m = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
            f = np.where(m, f, 0.0).astype(np.float32)
            color = np.array(
                [np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(bb, 0, 255)], np.float32
            ) / 255.0
            C = (1.0 - f)[..., None] * C + f[..., None] * color
        out[b] = np.clip(C, 0.0, 1.0)
    return out


def np_fitness(imgs, target, w=None, boost_only=False, boost_beta=1.0):
    """Masked-MSE fitness modes over [B, H, W, 3] images."""
    imgs = np.asarray(imgs, np.float64)
    dif2 = (imgs - np.asarray(target, np.float64)[None]) ** 2
    if w is None:
        return dif2.mean(axis=(1, 2, 3))
    w = np.asarray(w, np.float64)[None, :, :, None]
    if boost_only:
        wb = 1.0 + boost_beta * np.clip(w, 0, 1)
        return (dif2 * wb).mean(axis=(1, 2, 3)) / (wb.mean(axis=(1, 2, 3)) + 1e-12)
    return (dif2 * w).sum(axis=(1, 2, 3)) / (w.sum(axis=(1, 2, 3)) + 1e-12)
