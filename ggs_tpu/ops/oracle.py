"""Dense XLA renderer: the differentiable correctness anchor.

Implements the reference compositor's closed form (SURVEY.md §3.3):

    C_0 = background;  C_i = (1 - f_i) C_{i-1} + f_i color_i
    f_i = alpha_i * exp(-0.5 d^T Sigma_i^{-1} d),  applied only inside the
    splat's k-sigma AABB (modules/render.py:174-196), final clamp to [0,1]
    (modules/render.py:252).

The reference renderer is a no-grad Triton kernel (modules/render.py:8,121);
this oracle is a scan over splats in painter order, so it is differentiable
for free and serves as the ground truth for the Pallas kernels and for
gradient-based fitting. The scan is nested scan-of-chunks with
`jax.checkpoint` on the chunk body, so the backward pass stores only
chunk-boundary canvases (O(N/chunk * H * W) memory) and rematerializes
per-splat weight planes — division-free, stable even where f -> 1.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from . import codec


def _pad_noop_splats(g9: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Pad the splat axis with no-op splats (alpha = 0 -> f = 0 -> identity blend)."""
    if n_pad == 0:
        return g9
    pad_row = jnp.zeros((g9.shape[0], n_pad, codec.GENE_DIM), dtype=g9.dtype)
    return jnp.concatenate([g9, pad_row], axis=1)


def splat_weights(p: codec.SplatScreen, xf: jnp.ndarray, yf: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel weight f for splats.

    p fields and xf/yf must broadcast together. Matches the kernel math of
    modules/render.py:189-196: quadratic form through Sigma^{-1}, exp, alpha,
    masked to the integer AABB.
    """
    qx = xf - p.cx
    qy = yf - p.cy
    quad = p.sxx * (qx * qx) + 2.0 * p.sxy * (qx * qy) + p.syy * (qy * qy)
    f = jnp.exp(-0.5 * quad) * p.a
    m = (xf >= p.x0) & (xf <= p.x1) & (yf >= p.y0) & (yf <= p.y1)
    return jnp.where(m, f, 0.0)


@partial(
    jax.jit, static_argnames=("H", "W", "k_sigma", "background", "remat_chunk", "box")
)
def render_xla(
    g9: jnp.ndarray,
    H: int,
    W: int,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    remat_chunk: int = 64,
    box: str = "reference",  # "reference" (conservative hy) | "tight"
) -> jnp.ndarray:
    """Render renderer-format genomes [B, N, 9] (or [N, 9]) -> [B, H, W, 3] f32.

    box="tight" applies codec.tighten_boxes_exact — the ground truth for
    the kernels' precision="exact-tight" tier (bit-exact by sharing the
    one box expression; the walk itself is unchanged)."""
    squeeze = g9.ndim == 2
    if squeeze:
        g9 = g9[None]
    B, N, C = g9.shape
    assert C >= codec.GENE_DIM, f"expected >= 9 genome cols, got {C}"
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)

    chunk = max(1, min(remat_chunk, N))
    n_chunks = -(-N // chunk)
    g9 = _pad_noop_splats(g9, n_chunks * chunk - N)

    p = codec.preprocess(g9, H, W, k_sigma)  # fields [B, n_chunks*chunk]
    if box == "tight":
        p = codec.tighten_boxes_exact(p, k_sigma)
    # Scan layout: fields [n_chunks, chunk, B].
    p_scan = jax.tree.map(
        lambda t: jnp.transpose(t.reshape(B, n_chunks, chunk), (1, 2, 0)), p
    )

    xf = jnp.arange(W, dtype=jnp.float32)[None, None, :]  # [1, 1, W]
    yf = jnp.arange(H, dtype=jnp.float32)[None, :, None]  # [1, H, 1]

    def blend_one(canvas, ps):
        """Blend one splat per batch member; ps fields [B]."""
        pb = jax.tree.map(lambda t: t[:, None, None], ps)  # [B, 1, 1]
        f = splat_weights(pb, xf, yf)  # [B, H, W]
        color = jnp.stack([pb.rc, pb.gc, pb.bc], axis=-1)  # [B, 1, 1, 3]
        return (1.0 - f)[..., None] * canvas + f[..., None] * color, None

    @jax.checkpoint
    def chunk_body(canvas, pc):
        canvas, _ = jax.lax.scan(blend_one, canvas, pc)
        return canvas, None

    bg = jnp.asarray(background, dtype=jnp.float32)
    canvas0 = jnp.broadcast_to(bg, (B, H, W, 3))
    canvas, _ = jax.lax.scan(chunk_body, canvas0, p_scan)

    out = jnp.clip(canvas, 0.0, 1.0)
    return out[0] if squeeze else out


def render_reference_semantics(g_axes: jnp.ndarray, H: int, W: int, k_sigma: float = 3.0):
    """Axes-angle genomes -> images, end to end (codec + render), like the
    reference's fitness path (modules/fitness.py:13-15)."""
    return render_xla(codec.genome_to_renderer(g_axes), H, W, k_sigma=k_sigma)
