"""Renderer front door: one call, multiple backends.

`render_splats(g9, H, W, ...)` is the TPU-native replacement for the
reference's `render_splats_rgb_triton` (modules/render.py:203-252) —
same contract ([B, N, 9] or [N, 9] renderer genomes -> [B, H, W, 3] f32 in
[0, 1] over a white background), but jit/vmap/grad-compatible and
device-agnostic:

* impl="pallas": the tiled Pallas TPU kernel (VPU elementwise quadratic
  forms + sequential painter-order blend; ops/render_pallas.py — an MXU
  formulation was measured and rejected, docs/DESIGN.md §2).
* impl="xla": the dense differentiable oracle (ops/oracle.py).
* impl="auto": pallas on TPU, xla elsewhere.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import oracle


def _default_impl() -> str:
    if jax.default_backend() != "tpu":
        return "xla"
    try:  # pallas kernel present and importable
        from . import render_pallas  # noqa: F401

        return "pallas"
    except Exception:
        return "xla"


def render_splats(
    g9: jnp.ndarray,
    H: int,
    W: int,
    *,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    impl: str = "auto",
    bin_capacity: Optional[int] = None,
    tile_h: int = 64,
    tile_w: int = 128,
    remat_chunk: int = 64,
    precision: str = "highest",
    cull_eps: Optional[float] = None,
    corner_cull: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Render renderer-format genomes to images. See module docstring.

    precision/cull_eps/corner_cull select the Pallas walk tier (see
    render_pallas.render_pallas). The XLA oracle has no fast walk: it maps
    "exact-tight" to its tight-box render and treats "fast"/"bf16" as
    exact (a strict-quality superset — never looser than asked).
    """
    if impl == "auto":
        impl = _default_impl()
    if impl == "xla":
        return oracle.render_xla(
            g9, H, W, k_sigma=k_sigma, background=tuple(background),
            remat_chunk=remat_chunk,
            box="tight" if precision == "exact-tight" else "reference",
        )
    if impl == "pallas":
        from . import render_pallas

        return render_pallas.render_pallas(
            g9,
            H,
            W,
            k_sigma=k_sigma,
            background=tuple(background),
            bin_capacity=bin_capacity,
            tile_h=tile_h,
            tile_w=tile_w,
            # the image kernel has no bf16 compute mode (fitness-only);
            # "bf16" renders the exact f32 walk
            precision=precision if precision in ("fast", "exact-tight") else "highest",
            cull_eps=cull_eps,
            corner_cull=corner_cull,
            interpret=interpret,
        )
    raise ValueError(f"unknown renderer impl: {impl!r}")
