"""Pallas TPU rasterizer: tiled "over" compositing in VMEM.

TPU-native replacement for the reference's Triton kernel + torch binning
(modules/render.py:51-200), redesigned for XLA static shapes:

* Binning (`_bin_splats`): each splat's k-sigma AABB is mapped to a tile
  range and compacted into fixed-capacity, ascending-index splat lists
  (ascending = painter order, the same stable grouping the reference gets
  from its int64 sort key, render.py:106-110). Capacity defaults to N,
  which provably never drops a contributing splat (SURVEY.md §7). Small
  canvases use a dense [B, T, N] overlap matrix + lax.sort (vector-
  friendly); T >= 256 switches to a two-level pair-scatter Pallas kernel
  whose work scales with actual pairs (see _bin_splats_xy) — at 4k^2 the
  dense sort was 92% of a render step.

* Kernel (`_render_tile_kernel`): grid (batch, tile). Each program owns one
  (tile_h x tile_w) canvas block in VMEM — disjoint ownership, no atomics,
  same race-freedom-by-construction as the reference (SURVEY.md §5). The
  per-tile splat list and the [13, N] screen-space parameter table live in
  SMEM; the hot loop walks the list sequentially (strict painter order,
  identical blend expression to the oracle) with the quadratic-form and
  blend math vectorized over the tile's pixels on the VPU.

The canvas is rendered at tile-padded resolution and sliced, so H/W need
not be tile-aligned. Output matches ops/oracle.py within float tolerance.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import codec

# feats table rows (SMEM parameter layout)
_F_CX, _F_CY, _F_SXX, _F_SXY, _F_SYY, _F_R, _F_G, _F_B, _F_A = range(9)
_F_X0, _F_X1, _F_Y0, _F_Y1 = 9, 10, 11, 12
_NFEAT = 13

_SCATTER_PAD = 8  # sentinel slots past cnt (forward walks read <= cnt+unroll-1;
# the grad path passes 40: its chunk-aligned walks read <= cnt+31)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Largest splat count whose parameter table + bin list fit the 1 MiB SMEM
# window with double buffering: 13 rows * 4 B * N (feats) + 4 B * N (idx),
# x2 buffering => N <= ~9.2k; 8000 leaves headroom. Beyond this, splats are
# rendered in sequential chunks, each pass starting from the previous
# canvas — exact, because "over" composites associatively in painter order.
_MAX_SMEM_SPLATS = 8000


def _split_screen(p: codec.SplatScreen, lo: int, hi: int) -> codec.SplatScreen:
    return jax.tree_util.tree_map(lambda a: a[:, lo:hi], p)


def _render_padded(
    p: codec.SplatScreen,
    Hs: int,
    W: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    unroll: int,
    interpret: bool,
    bin_capacity: Optional[int] = None,
    init_p: Optional[jnp.ndarray] = None,
    precision: str = "highest",
    corner_eps: Optional[float] = None,
) -> jnp.ndarray:
    """Screen-space splats (slab coords) -> padded canvas [B, 3, Hp, Wp].

    One compositing pass over this SplatScreen's splats; with init_p, the
    canvas starts from a previous pass instead of the background.
    corner_eps (fast mode) enables the rect-min corner cull at that ε.
    """
    B, N = p.cx.shape
    n_tx = _cdiv(W, tile_w)
    n_ty = _cdiv(Hs, tile_h)
    T = n_tx * n_ty
    cap = N if bin_capacity is None else min(bin_capacity, N)

    turbo = precision == "fast"
    feats = _splat_feats_turbo(p) if turbo else _splat_feats_fast(p)
    # pad_slots >= unroll: the walk reads up to cnt + unroll - 1 entries,
    # and on hardware the scatter binning only initializes pad_slots
    # sentinels past cnt (interpret mode zero-fills, hiding shortfalls).
    bin_idx, cnt = _bin_splats(
        p, n_tx, n_ty, tile_h, tile_w, cap, interpret,
        pad_slots=max(unroll, _SCATTER_PAD),
        corner=None if corner_eps is None else _corner_params(p, corner_eps),
    )
    bin_idx = jnp.pad(bin_idx, ((0, 0), (0, 0), (0, unroll)), constant_values=N)

    in_specs = [
        pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, cap + unroll), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, _NFEAT, N + 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
    ]
    args = [cnt[:, :, None, None], bin_idx[:, :, None, :], feats]
    if init_p is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 3, tile_h, tile_w),
                lambda b, t: (b, 0, t // n_tx, t % n_tx),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(init_p)

    return pl.pallas_call(
        functools.partial(
            _render_tile_kernel,
            n_tx=n_tx,
            tile_h=tile_h,
            tile_w=tile_w,
            background=background,
            unroll=unroll,
            has_init=init_p is not None,
            turbo=turbo,
        ),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 3, tile_h, tile_w),
            lambda b, t: (b, 0, t // n_tx, t % n_tx),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, n_ty * tile_h, n_tx * tile_w), jnp.float32),
        interpret=interpret,
    )(*args)


def _chunked_passes(
    p: codec.SplatScreen,
    Hs: int,
    W: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    unroll: int,
    interpret: bool,
    bin_capacity: Optional[int],
    keep_last: bool,
    precision: str = "highest",
    corner_eps: Optional[float] = None,
):
    """Split splats into SMEM-sized chunks. Returns (canvas_before_last,
    last_chunk_screen) when keep_last (for fused-fitness epilogues), else
    (full canvas, None)."""
    N = p.cx.shape[1]
    n_chunks = max(1, _cdiv(N, _MAX_SMEM_SPLATS))
    bounds = [i * N // n_chunks for i in range(n_chunks + 1)]
    img_p = None
    last = n_chunks - 1
    for i in range(n_chunks):
        pc = _split_screen(p, bounds[i], bounds[i + 1]) if n_chunks > 1 else p
        if keep_last and i == last:
            return img_p, pc
        img_p = _render_padded(
            pc, Hs, W, tile_h, tile_w, background, unroll, interpret,
            bin_capacity=bin_capacity, init_p=img_p, precision=precision,
            corner_eps=corner_eps,
        )
    return img_p, None


def _splat_feats(p: codec.SplatScreen) -> jnp.ndarray:
    """SplatScreen fields [B, N] -> feats [B, 13, N] float32 (raw layout,
    used by the backward kernel which needs unscaled precision terms)."""
    return jnp.stack(
        [
            p.cx, p.cy, p.sxx, p.sxy, p.syy,
            p.rc, p.gc, p.bc, p.a,
            p.x0.astype(jnp.float32), p.x1.astype(jnp.float32),
            p.y0.astype(jnp.float32), p.y1.astype(jnp.float32),
        ],
        axis=1,
    )


def _splat_feats_fast(p: codec.SplatScreen) -> jnp.ndarray:
    """Forward-kernel parameter table [B, 13, N+1] f32, constants pre-folded.

    Rows 2-4 hold (-0.5*sxx, -sxy, -0.5*syy) so the hot loop computes
    exp(quad') directly instead of exp(-0.5*quad): scaling each coefficient
    by the exact power of two -0.5 (and -1 for the cross term, absorbing the
    reference's 2*sxy, render.py:190) keeps every f32 intermediate
    bit-identical to the unfolded form while saving a vector multiply per
    splat per tile. Column N is a sentinel (alpha 0, inverted AABB) that
    composites to an exact no-op — the unrolled walk reads up to
    `unroll - 1` entries past cnt and lands on it harmlessly.
    """
    B, N = p.cx.shape
    feats = jnp.stack(
        [
            p.cx, p.cy, -0.5 * p.sxx, -p.sxy, -0.5 * p.syy,
            p.rc, p.gc, p.bc, p.a,
            p.x0.astype(jnp.float32), p.x1.astype(jnp.float32),
            p.y0.astype(jnp.float32), p.y1.astype(jnp.float32),
        ],
        axis=1,
    )
    sentinel = jnp.zeros((B, _NFEAT, 1), jnp.float32)
    sentinel = sentinel.at[:, _F_X0, 0].set(1e9)
    sentinel = sentinel.at[:, _F_X1, 0].set(-1e9)
    return jnp.concatenate([feats, sentinel], axis=2)


_LOG2E = 1.4426950408889634


def _splat_feats_turbo(p: codec.SplatScreen) -> jnp.ndarray:
    """Fast-mode parameter table [B, 13, N+1] f32 (precision="fast").

    Cuts ~4 VPU ops per (tile, splat) pair off the exact walk, at ~5e-5
    max canvas error (tests/test_render_pallas.py::test_fast_mode):

    * rows 2-4 fold -0.5*log2(e) (and -log2(e) for the cross term) into
      the precision coefficients and row 8 holds log2(alpha), so the walk
      computes f = exp2(nsxx*qx^2 + nsxy*qx*qy + nsyy*qy^2 + log2a) as
      three FMAs + one exp2 — no separate *log2e and *alpha multiplies.
      alpha = 0 (incl. the sentinel) maps to log2a = -inf => f = 0 exactly.
    * rows 9-12 hold open-interval f32 thresholds (x0-1, x1+1, y0-1, y1+1):
      for integer pixel coords, xf > x0-1 <=> xf >= x0, so the AABB mask
      needs no integer pixel planes. Integer +-1 is exact in f32 (< 2^24).

    Folding by log2(e) is NOT a power-of-two scale, so this mode is not
    bit-exact vs ops/oracle.py — the default precision="highest"
    (_splat_feats_fast) remains the bit-exact path.
    """
    B, N = p.cx.shape
    log2a = jnp.where(
        p.a > 0.0, jnp.log2(jnp.maximum(p.a, 1e-38)), -jnp.inf
    )
    feats = jnp.stack(
        [
            p.cx, p.cy,
            (-0.5 * _LOG2E) * p.sxx, (-_LOG2E) * p.sxy, (-0.5 * _LOG2E) * p.syy,
            p.rc, p.gc, p.bc, log2a,
            p.x0.astype(jnp.float32) - 1.0, p.x1.astype(jnp.float32) + 1.0,
            p.y0.astype(jnp.float32) - 1.0, p.y1.astype(jnp.float32) + 1.0,
        ],
        axis=1,
    )
    sentinel = jnp.zeros((B, _NFEAT, 1), jnp.float32)
    sentinel = sentinel.at[:, 8, 0].set(-jnp.inf)  # f = exp2(-inf) = 0
    sentinel = sentinel.at[:, _F_X0, 0].set(1e9)
    sentinel = sentinel.at[:, _F_X1, 0].set(-1e9)
    return jnp.concatenate([feats, sentinel], axis=2)


def _prep_turbo_kernel(g_ref, ff_ref, fi_ref, *, maxx, maxy, k_sigma, cull_eps):
    """Genome preprocess + fast-mode table build as ONE Pallas op.

    Replaces the ~50-op XLA chain codec.preprocess -> _splat_feats_turbo,
    which on the attached TPU costs ~1 ms of per-op dispatch latency per
    call regardless of batch size (the small-B cliff, docs/DESIGN.md §2).
    Everything is vectorized over splats on the VPU lanes; semantics match
    codec.preprocess (modules/render.py:9-47) to ~1 ulp, which is inside
    the fast mode's documented tolerance — except the AABBs, which use
    the fast-mode TIGHT r_eff-sigma extents (see _tighten_boxes: binning
    cull, ~11% fewer pairs) instead of the reference's conservative
    y-bound; alpha <= cull_eps yields an empty box.

    g_ref: (1, 9, N) renderer genome, param-major; ff_ref: (1, 13, N+1)
    fast feats (see _splat_feats_turbo); fi_ref: (1, 4, N) i32 AABBs for
    _bin_splats_xy.
    """
    import math

    g = g_ref[0]  # (9, N)
    cx = jnp.clip(g[0:1], 0.0, 1.0) * maxx
    cy = jnp.clip(g[1:2], 0.0, 1.0) * maxy
    l11 = jnp.maximum(jnp.exp(g[2:3]), 1e-6)
    l22 = jnp.maximum(jnp.exp(g[3:4]), 1e-6)
    l21 = g[4:5]
    a = jnp.clip(g[8:9], 0.0, 255.0) * (1.0 / 255.0)
    r2 = 2.0 * (jnp.log(jnp.maximum(a, 1e-38)) - math.log(cull_eps))
    r = jnp.minimum(jnp.sqrt(jnp.maximum(r2, 0.0)), k_sigma)
    hx = jnp.maximum(r * l11, 1.0)
    hy = jnp.maximum(r * jnp.sqrt(l21 * l21 + l22 * l22), 1.0)
    live = a > cull_eps
    # Dead splats: x0=1 > x1=-1 empties the TILE range too (see
    # _tighten_boxes — x0-1 could still share x0's tile index).
    x0 = jnp.where(live, jnp.floor(jnp.clip(cx - hx, 0.0, maxx)), 1.0)
    x1 = jnp.where(live, jnp.ceil(jnp.clip(cx + hx, 0.0, maxx)), -1.0)
    y0 = jnp.floor(jnp.clip(cy - hy, 0.0, maxy))
    y1 = jnp.ceil(jnp.clip(cy + hy, 0.0, maxy))
    inv11 = 1.0 / l11
    inv22 = 1.0 / l22
    inv21 = -l21 * (inv11 * inv22)
    nsxx = (-0.5 * _LOG2E) * (inv11 * inv11 + inv21 * inv21)
    nsxy = (-_LOG2E) * (inv21 * inv22)
    nsyy = (-0.5 * _LOG2E) * (inv22 * inv22)
    rc = jnp.clip(g[5:6], 0.0, 255.0) * (1.0 / 255.0)
    gc = jnp.clip(g[6:7], 0.0, 255.0) * (1.0 / 255.0)
    bc = jnp.clip(g[7:8], 0.0, 255.0) * (1.0 / 255.0)
    log2a = jnp.where(a > 0.0, jnp.log2(jnp.maximum(a, 1e-38)), -jnp.inf)

    n = cx.shape[1]
    rows = [
        cx, cy, nsxx, nsxy, nsyy, rc, gc, bc, log2a,
        x0 - 1.0, x1 + 1.0, y0 - 1.0, y1 + 1.0,
    ]
    for r, row in enumerate(rows):
        ff_ref[0, r : r + 1, :n] = row
    # sentinel column (splat N): exact no-op under the turbo walk
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (_NFEAT, 1), 0)
    sent = jnp.where(r_ids == 8, -jnp.inf, 0.0)
    sent = jnp.where((r_ids == 9) | (r_ids == 11), 1e9, sent)
    sent = jnp.where((r_ids == 10) | (r_ids == 12), -1e9, sent)
    ff_ref[0, :, n : n + 1] = sent
    fi_ref[0, 0:1, :] = x0.astype(jnp.int32)
    fi_ref[0, 1:2, :] = x1.astype(jnp.int32)
    fi_ref[0, 2:3, :] = y0.astype(jnp.int32)
    fi_ref[0, 3:4, :] = y1.astype(jnp.int32)


def _prep_turbo_pallas(
    g9: jnp.ndarray, H: int, W: int, k_sigma: float, interpret: bool,
    cull_eps: Optional[float] = None,
):
    """[B, N, 9] renderer genomes -> (ff [B,13,N+1], fi [B,4,N] i32)."""
    B, N, _ = g9.shape
    g9T = jnp.transpose(g9, (0, 2, 1))
    return pl.pallas_call(
        functools.partial(
            _prep_turbo_kernel,
            maxx=float(W - 1), maxy=float(H - 1), k_sigma=float(k_sigma),
            cull_eps=DEFAULT_CULL_EPS if cull_eps is None else float(cull_eps),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 9, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, _NFEAT, N + 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, _NFEAT, N + 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 4, N), jnp.int32),
        ],
        interpret=interpret,
    )(g9T)


# Fast-mode cull: shrink each splat's AABB to the TIGHT r_eff-sigma
# extents r_eff*l11 / r_eff*sqrt(l21^2+l22^2) with
# r_eff = min(k, sqrt(2 ln(alpha/eps))) — the radius beyond which the
# splat's contribution alpha*exp(-r^2/2) falls under eps. This replaces
# the reference-pinned conservative y-bound k*(|l21|+|l22|) (render.py:25,
# up to sqrt(2) too tall) in fast mode: ~11% fewer (tile, splat) pairs on
# the bench population, and splats with alpha <= eps bin nowhere. The
# tight box feeds BOTH the bin lists and the walk's pixel mask, so the
# truncation boundary is consistent everywhere. Error = the k-sigma tail
# in the tight-vs-conservative strip (<= alpha*exp(-k^2/2) ~ 0.011*alpha)
# plus eps where r_eff < k; measured max canvas err ~1e-2, mean ~2e-4,
# fitness ranking identical (tests/test_render_pallas.py::test_fast_mode*,
# GA-quality A/B in DESIGN §8c).
#
# DEFAULT_CULL_EPS is a plain constant, the single library default:
# Objective.cull_eps carries per-run overrides (the old GGS_CULL_EPS env
# var was read once at import — stale for anyone setting it after import,
# and a second config path beside the typed knob; retired round 4).
DEFAULT_CULL_EPS = 2e-3


def _tighten_boxes(
    p: codec.SplatScreen, k_sigma: float, cull_eps: Optional[float] = None
) -> codec.SplatScreen:
    """Fast-mode SplatScreen -> same splats with binning-tight AABBs.

    The tight extents come from the covariance diagonal (cov = L L^T:
    cov_xx = l11^2, cov_yy = l21^2 + l22^2), recovered here from the
    precision entries (cov = Sigma^-1 inverse). The tight box is
    INTERSECTED with the existing box, so canvas clipping and row-slab
    shifts (fitness_pallas_partial) are inherited; alpha <= eps yields an
    empty box (x1 < x0 bins to no tile)."""
    import math

    eps = DEFAULT_CULL_EPS if cull_eps is None else float(cull_eps)
    det = p.sxx * p.syy - p.sxy * p.sxy
    cov_xx = p.syy / det
    cov_yy = p.sxx / det
    r2 = 2.0 * (jnp.log(jnp.maximum(p.a, 1e-38)) - math.log(eps))
    r = jnp.minimum(jnp.sqrt(jnp.maximum(r2, 0.0)), k_sigma)
    hx = jnp.maximum(r * jnp.sqrt(jnp.maximum(cov_xx, 0.0)), 1.0)
    hy = jnp.maximum(r * jnp.sqrt(jnp.maximum(cov_yy, 0.0)), 1.0)
    live = p.a > eps
    x0 = jnp.maximum(p.x0, jnp.floor(p.cx - hx).astype(jnp.int32))
    x1 = jnp.minimum(p.x1, jnp.ceil(p.cx + hx).astype(jnp.int32))
    y0 = jnp.maximum(p.y0, jnp.floor(p.cy - hy).astype(jnp.int32))
    y1 = jnp.minimum(p.y1, jnp.ceil(p.cy + hy).astype(jnp.int32))
    # Dead splats: x0=1 > x1=-1 makes the TILE range empty too (x1=x0-1
    # would still share a tile unless x0 sat on a tile boundary: integer
    # division maps both endpoints into the same tile index).
    x0 = jnp.where(live, x0, 1)
    x1 = jnp.where(live, x1, -1)
    return p._replace(x0=x0, x1=x1, y0=y0, y1=y1)


def _corner_eps(
    precision: str, corner_cull: bool, cull_eps: Optional[float]
) -> Optional[float]:
    """Effective corner-cull ε: enabled only in fast mode, at the same ε
    as the tight-box cull (one tolerance knob, two cull mechanisms)."""
    if precision != "fast" or not corner_cull:
        return None
    return DEFAULT_CULL_EPS if cull_eps is None else float(cull_eps)


def _corner_params(
    p: codec.SplatScreen, cull_eps: Optional[float]
) -> Tuple[jnp.ndarray, ...]:
    """SplatScreen -> rect-min corner-cull params (see _corner_keep).

    Same log2-folded quadratic the turbo walk evaluates
    (_splat_feats_turbo rows 0-4, 8), so the cull's threshold is exactly
    the walk's contribution scale."""
    import math

    eps = DEFAULT_CULL_EPS if cull_eps is None else float(cull_eps)
    nsxx = (-0.5 * _LOG2E) * p.sxx
    nsxy = (-_LOG2E) * p.sxy
    nsyy = (-0.5 * _LOG2E) * p.syy
    log2a = jnp.where(p.a > 0.0, jnp.log2(jnp.maximum(p.a, 1e-38)), -jnp.inf)
    return (p.cx, p.cy, nsxx, nsxy, nsyy, log2a, math.log2(eps))


def _corner_keep(
    corner, x0, x1, y0, y1, t_x, t_y, tile_h: int, tile_w: int
) -> jnp.ndarray:
    """Rect-min corner cull: keep a (tile, splat) pair iff the splat's peak
    contribution anywhere on the pair's pixel rect reaches the cull ε.

    The turbo walk's per-pixel log2-contribution is the CONCAVE quadratic
    n(dx, dy) = nsxx dx² + nsxy dx dy + nsyy dy² + log2a (maximum at the
    splat center). Its max over the rect R = tile ∩ AABB (relative coords
    [dx0,dx1]×[dy0,dy1]) has a closed form: if the center lies in R the
    max is log2a; otherwise it lies on a boundary face of R visible from
    the center (moving any boundary point straight toward the maximizer
    increases a concave function until the segment leaves R through a
    visible face). The two visible faces are the x- and y-edges nearest
    the center; each edge's 1-D concave max is its unconstrained vertex
    clamped to the edge segment. Both edge evaluations also cover the
    center-inside case (clamp(0) = 0), so no branch is needed.

    Culling a pair removes a contribution < ε at every pixel of the pair —
    the same tolerance class as the ε-aware tight box (_tighten_boxes),
    just sharpened from the box's 1-D marginals to the true 2-D form
    (ellipse-corner tiles pass the AABB overlap test but fail this one).
    DESIGN §8c records the round-3 build of this cull as measured-viable;
    round 4 re-lands it behind Objective.corner_cull.
    """
    cx, cy, nsxx, nsxy, nsyy, log2a, log2eps = corner
    # pair rect in pixel coords: tile pixel range ∩ AABB, center-relative
    f32 = lambda v: v.astype(jnp.float32)  # noqa: E731
    dx0 = jnp.maximum(f32(t_x * tile_w), f32(x0[:, None, :])) - cx[:, None, :]
    dx1 = jnp.minimum(f32(t_x * tile_w + (tile_w - 1)), f32(x1[:, None, :])) - cx[:, None, :]
    dy0 = jnp.maximum(f32(t_y * tile_h), f32(y0[:, None, :])) - cy[:, None, :]
    dy1 = jnp.minimum(f32(t_y * tile_h + (tile_h - 1)), f32(y1[:, None, :])) - cy[:, None, :]
    nxx = nsxx[:, None, :]
    nxy = nsxy[:, None, :]
    nyy = nsyy[:, None, :]
    # vertex reciprocals per splat (division off the [B,T,N] grid);
    # ns** <= -eps_det < 0 away from degeneracy (codec clamps l11/l22)
    rx = (-0.5) * nsxy / jnp.minimum(nsxx, -1e-30)
    ry = (-0.5) * nsxy / jnp.minimum(nsyy, -1e-30)
    # nearest-x edge: dx = clamp(0), dy = clamped vertex of n(dxc, ·)
    dxc = jnp.minimum(jnp.maximum(dx0, 0.0), dx1)
    dyv = jnp.clip(ry[:, None, :] * dxc, dy0, dy1)
    v1 = (nxx * dxc + nxy * dyv) * dxc + nyy * dyv * dyv
    # nearest-y edge, symmetric
    dyc = jnp.minimum(jnp.maximum(dy0, 0.0), dy1)
    dxv = jnp.clip(rx[:, None, :] * dyc, dx0, dx1)
    v2 = (nyy * dyc + nxy * dxv) * dyc + nxx * dxv * dxv
    return log2a[:, None, :] + jnp.maximum(v1, v2) >= log2eps


def _corner_band_xranges(
    corner, x0, x1, y0, y1, band_px: int, tile_w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized corner cull for the scatter-binning path: per coarse
    row-band, the tile-COLUMN interval where the splat's peak contribution
    over (band strip ∩ AABB) can reach the cull ε. Returns (txl, txh)
    [B, _N_COARSE, N] i32 (txl > txh = nothing to bin in that band).

    The per-pair rect-max test (_corner_keep) is unaffordable in the
    scalar scatter kernel (~30 ops × 40-60 cycles per pair, round-3/4
    verdicts), but its x-marginal over a whole band is a closed-form
    interval computable densely in XLA: with the band's dy clamped to
    [dyl, dyh], m(dx) = max_dy n(dx, dy) is a concave piecewise quadratic
    (dy* = ry·dx clamped; pieces dy=dyl / interior / dy=dyh), and
    {dx : m(dx) >= log2eps - log2a} is ONE interval. Each piece
    contributes (its quadratic's root interval ∩ its activity domain);
    the union of the three pieces IS the exact interval (pieces partition
    the dx axis and the superlevel set of a concave function is
    connected). Pixel→tile conversion floor/ceil-widens, so the cull is
    conservative: a culled (tile, splat) pair has peak contribution < ε
    over EVERY pixel its tile shares with the splat's box in this band —
    the same ε class as the dense corner cull, only weaker (band-level,
    not tile-level). Soundness + shrink vs the dense corner lists are
    pinned in tests/test_render_pallas.py::test_scatter_corner_band_cull.
    """
    cx, cy, nsxx, nsxy, nsyy, log2a, log2eps = corner
    BIG = jnp.float32(1e30)
    ex = lambda a: a[:, None, :]  # [B, N] -> [B, 1, N]  # noqa: E731
    c = jnp.arange(_N_COARSE, dtype=jnp.float32)[None, :, None]  # [1, C, 1]
    # dy over band strip ∩ the splat's own y-box: sound because walk-mask
    # zeroes any tile-row pixels outside the box, exactly like the dense
    # corner test's rect = tile ∩ AABB; a pixel-empty intersection implies
    # a tile-empty one (integer division monotonicity), so garbage
    # intervals for unreachable bands are never read.
    dyl = jnp.maximum(c * band_px, ex(y0.astype(jnp.float32))) - ex(cy)
    dyh = jnp.minimum(c * band_px + (band_px - 1), ex(y1.astype(jnp.float32))) - ex(cy)
    nxx = ex(nsxx)
    nxy = ex(nsxy)
    nyy = ex(nsyy)
    L = log2eps - ex(log2a)  # need n(dx, dy) >= L (L > 0 => unreachable)

    def quad_interval(dyc):
        # {dx : nxx dx² + (nxy dyc) dx + nyy dyc² - L >= 0}, nxx < 0
        A = -nxx
        Bq = -nxy * dyc
        Cq = L - nyy * dyc * dyc
        D = Bq * Bq - 4.0 * A * Cq
        sq = jnp.sqrt(jnp.maximum(D, 0.0))
        inv2A = 0.5 / jnp.maximum(A, 1e-30)
        lo = (-Bq - sq) * inv2A
        hi = (-Bq + sq) * inv2A
        empty = D < 0.0
        return jnp.where(empty, BIG, lo), jnp.where(empty, -BIG, hi)

    ry = nxy / (-2.0 * jnp.minimum(nyy, -1e-30))  # dy*(dx) = ry·dx

    def halfplane(cval, ge: bool):
        # interval of {dx : ry·dx >= cval} (ge) or {ry·dx <= cval}
        rsafe = jnp.where(jnp.abs(ry) > 1e-20, ry, 1.0)
        q = jnp.clip(cval / rsafe, -BIG, BIG)
        pos = ry > 1e-20
        neg = ry < -1e-20
        zero = ~(pos | neg)
        if ge:
            lo = jnp.where(pos, q, -BIG)
            hi = jnp.where(neg, q, BIG)
            dead = zero & (cval > 0.0)
        else:
            lo = jnp.where(neg, q, -BIG)
            hi = jnp.where(pos, q, BIG)
            dead = zero & (cval < 0.0)
        return jnp.where(dead, BIG, lo), jnp.where(dead, -BIG, hi)

    # piece P0: dy clamped at dyl (active where ry·dx <= dyl)
    q0l, q0h = quad_interval(dyl)
    d0l, d0h = halfplane(dyl, ge=False)
    # piece P2: dy clamped at dyh (active where ry·dx >= dyh)
    q2l, q2h = quad_interval(dyh)
    d2l, d2h = halfplane(dyh, ge=True)
    # piece P1: interior vertex (m = qi·dx², qi = nxx - nxy²/(4 nyy) < 0)
    qi = nxx - nxy * nxy / (4.0 * jnp.minimum(nyy, -1e-30))
    R = jnp.sqrt(jnp.maximum(L / jnp.minimum(qi, -1e-30), 0.0))
    q1l = jnp.where(L <= 0.0, -R, BIG)
    q1h = jnp.where(L <= 0.0, R, -BIG)
    d1l0, d1h0 = halfplane(dyl, ge=True)
    d1l1, d1h1 = halfplane(dyh, ge=False)
    d1l, d1h = jnp.maximum(d1l0, d1l1), jnp.minimum(d1h0, d1h1)

    ulo, uhi = BIG, -BIG
    for ql, qh, dl, dh in ((q0l, q0h, d0l, d0h), (q1l, q1h, d1l, d1h),
                           (q2l, q2h, d2l, d2h)):
        plo = jnp.maximum(ql, dl)
        phi = jnp.minimum(qh, dh)
        keep = plo <= phi
        ulo = jnp.minimum(ulo, jnp.where(keep, plo, BIG))
        uhi = jnp.maximum(uhi, jnp.where(keep, phi, -BIG))
    band_hit = dyl <= dyh  # box ∩ band strip nonempty
    ulo = jnp.where(band_hit, ulo, BIG)
    uhi = jnp.where(band_hit, uhi, -BIG)

    x0f = ex(x0.astype(jnp.float32))
    x1f = ex(x1.astype(jnp.float32))
    xlo = jnp.clip(jnp.maximum(x0f, jnp.floor(ex(cx) + ulo)), 0.0, 3.0e7)
    xhi = jnp.clip(jnp.minimum(x1f, jnp.ceil(ex(cx) + uhi)), -2.0, 3.0e7)
    txl = xlo.astype(jnp.int32) // tile_w
    # empty => txh = txl - 1 EXACTLY: the fine walk computes npairs =
    # rows * (txh - txl + 1) and rows may itself be <= 0 when the splat
    # misses a group — nx must be 0, not negative, to keep npairs <= 0
    txh = jnp.where(xhi < xlo, txl - 1, xhi.astype(jnp.int32) // tile_w)
    return txl, txh


def _bin_splats(
    p: codec.SplatScreen, n_tx: int, n_ty: int, tile_h: int, tile_w: int, cap: int,
    interpret: bool = False, pad_slots: int = _SCATTER_PAD,
    corner=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABBs from a SplatScreen -> static-shape per-tile splat lists."""
    return _bin_splats_xy(
        p.x0, p.x1, p.y0, p.y1, n_tx, n_ty, tile_h, tile_w, cap, interpret,
        pad_slots, corner=corner,
    )


def _bin_splats_xy(
    x0, x1, y0, y1, n_tx: int, n_ty: int, tile_h: int, tile_w: int, cap: int,
    interpret: bool = False, pad_slots: int = _SCATTER_PAD,
    corner=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABBs [B, N] -> (bin_idx [B, T, cap] int32 ascending, cnt [B, T] int32).

    Tile t covers splat s iff their rectangles overlap (the reference's
    per-splat tile-range expansion, render.py:59-66, inverted to a
    tile-major test so shapes stay static). Lists are index-sorted, padded
    with N (a sentinel the kernel never reads past cnt).

    Two implementations with bit-identical outputs (tests/test_render_pallas
    ::test_scatter_binning_matches_dense), dispatched on tile count:

    * dense (default): [B, T, N] overlap matrix compacted by lax.sort.
      O(B*T*N log^2 N) — fine up to ~1024^2 canvases, and the matrix is
      vectorized work the VPU eats at large B.
    * scatter (T >= 256): a scalar Pallas kernel walks splats in painter
      order and appends each to its covered tiles' SMEM lists — work is
      proportional to actual (tile, splat) PAIRS, like the reference's
      pair expansion (render.py:59-66), not T*N. At 4k^2 / 8k-splat chunks
      the dense sort costs ~16 ms/chunk (~92% of a render step); scatter
      is pair-bound (<1 ms). Ascending append order == the sort's output;
      overflow beyond cap keeps the first cap indices, same as the dense
      truncation rule.
    """
    if n_tx * n_ty >= 256:
        # The scatter kernel can't afford the per-pair 2-D rect-max test
        # (~30 ops x 40-60 cycles each on the scalar core — CLAUDE.md),
        # but it consumes the VECTORIZED band-level form: per coarse
        # row-band, the corner test's x-marginal is a closed-form tile-
        # column interval computed densely in XLA (_corner_band_xranges)
        # and read per (band, splat) by the fine walk — band-granular
        # (weaker than the dense per-tile test) but the same ε class, so
        # lists may differ from the dense corner lists by canvas size
        # (round-4 verdict item 5).
        return _bin_splats_scatter(
            x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, cap, interpret,
            pad_slots, corner=corner,
        )
    return _bin_splats_dense(
        x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, cap, corner=corner
    )


def _bin_splats_dense(
    x0, x1, y0, y1, n_tx: int, n_ty: int, tile_h: int, tile_w: int, cap: int,
    corner=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense binning: [B, T, N] overlap matrix compacted by lax.sort.
    Fully sentinel-padded to cap. Also the correctness fallback the scatter
    path jumps to (lax.cond) when a tile overflows its SMEM capacity.
    `corner` (fast mode, opt-in) ANDs in the rect-min corner-cull test
    (_corner_keep)."""
    B, N = x0.shape
    tx0 = x0 // tile_w
    tx1 = x1 // tile_w
    ty0 = y0 // tile_h
    ty1 = y1 // tile_h

    T = n_ty * n_tx
    t_ids = jnp.arange(T, dtype=jnp.int32)
    t_x = (t_ids % n_tx)[None, :, None]  # [1, T, 1]
    t_y = (t_ids // n_tx)[None, :, None]

    ov = (
        (tx0[:, None, :] <= t_x)
        & (tx1[:, None, :] >= t_x)
        & (ty0[:, None, :] <= t_y)
        & (ty1[:, None, :] >= t_y)
    )  # [B, T, N]
    if corner is not None:
        ov &= _corner_keep(corner, x0, x1, y0, y1, t_x, t_y, tile_h, tile_w)
    order = jnp.where(ov, jnp.arange(N, dtype=jnp.int32)[None, None, :], jnp.int32(N))
    bin_idx = jax.lax.sort(order, dimension=-1)[..., :cap]
    cnt = jnp.minimum(jnp.sum(ov, axis=-1, dtype=jnp.int32), cap)
    return bin_idx, cnt




_N_COARSE = 8  # coarse row-bands for two-level scatter (fits SMEM lists)


def _band_lists_xla(ty0t, ty1t, n_ty: int, rpt: int, cap_g: int, keep=None):
    """Level 1 of the two-level scatter, VECTORIZED: per coarse row-band
    (rpt tile rows) ascending splat lists + counts, as a [B, _N_COARSE, N]
    overlap matrix compacted by lax.sort. Replaces the scalar coarse-walk
    Pallas kernel (round-2 verdict #3): with only _N_COARSE bands the
    dense matrix is tiny (8 x N lanes) and the VPU sort beats ~N scalar
    loop iterations at ~40-60 cycles each; the fine scatter kernel then
    does the ONLY remaining scalar walk, over its own band's list.
    Ascending sort output == the scalar walk's ascending append order, so
    fine lists are unchanged bit-for-bit (equality tests pin this).

    ty0t/ty1t are TILE row coords [B, N] (empty boxes have ty1t < ty0t
    and land in no band). cap_g >= N so lists are lossless; entries past
    gcnt are the sentinel N. `keep` [B, C, N] (optional) ANDs a per-band
    prefilter into the overlap matrix — the corner cull's band-emptiness
    (txl > txh from _corner_band_xranges), so fully-culled splats are
    never walked by the fine kernel at all."""
    B, N = ty0t.shape
    a = jnp.maximum(ty0t, 0) // rpt  # [B, N]
    b = jnp.minimum(ty1t, n_ty - 1) // rpt
    c = jnp.arange(_N_COARSE, dtype=jnp.int32)[None, :, None]  # [1, C, 1]
    ov = (a[:, None, :] <= c) & (b[:, None, :] >= c)  # [B, C, N]
    if keep is not None:
        ov &= keep
    order = jnp.where(ov, jnp.arange(N, dtype=jnp.int32)[None, None, :], jnp.int32(N))
    gl = jax.lax.sort(order, dimension=-1)
    if cap_g > N:
        gl = jnp.pad(gl, ((0, 0), (0, 0), (0, cap_g - N)), constant_values=N)
    gcnt = jnp.sum(ov, axis=-1, dtype=jnp.int32)[..., None]
    return gl, gcnt


def _blocked_fori(n: int, k: int, body, init):
    """fori_loop over a STATIC trip count with a k-wide body: amortizes
    Mosaic's ~40-60-cycle scalar-loop machinery (docs/DESIGN.md §12)
    across k body copies. (lax.fori_loop's own `unroll` only supports
    full unroll in the Mosaic lowering; full unroll of a few-hundred-tile
    loop bloats compile, so block manually.) Remainder iterations are
    emitted unrolled after the loop."""
    nb = n // k

    def blk(j, c):
        for t in range(k):
            c = body(j * k + t, c)
        return c

    c = jax.lax.fori_loop(0, nb, blk, init) if nb else init
    for r in range(nb * k, n):
        c = body(r, c)
    return c


def _scatter_bin_kernel(
    rng_ref,  # (1, 4, N) SMEM i32: tx0, tx1, ty0, ty1 (tile coords)
    *refs,  # [gl_ref, gcnt_ref if coarse,] [cxr_ref if corner_x,] idx_ref, ovf_ref
    n_tx: int,
    rpg: int,
    cap: int,
    N: int,
    coarse: bool = False,
    rpt: int = 0,
    cap_g: int = 0,
    pad_slots: int = _SCATTER_PAD,
    corner_x: bool = False,
):
    """Pair-scatter binning for one (batch, tile-row-group) cell.

    Pure scalar-core kernel: walks splats in ascending (painter) order and
    appends each to the SMEM list of every covered tile in this group's
    rows — O(pairs), the reference's per-splat tile-range expansion
    (render.py:59-66) without the torch sort. With `coarse`, the walk runs
    over this group's coarse-band list (from _band_lists_xla) instead
    of all N splats, so total scalar work across groups is ~2x the actual
    pair count rather than n_groups * N.

    idx_ref layout: column 0 of each tile row holds the running count
    (SMEM lane-pads a separate (tiles, 1) output 128x, blowing the SMEM
    budget); list entries start at column 1. Slots past cnt are only ever
    read up to the walk kernels' unroll/chunk overshoot, so only
    _SCATTER_PAD sentinel entries are written (the rest of the block is
    dead data).
    """
    cxr_ref = None
    if coarse and corner_x:
        gl_ref, gcnt_ref, cxr_ref, idx_ref, ovf_ref = refs
    elif coarse:
        gl_ref, gcnt_ref, idx_ref, ovf_ref = refs
    else:
        gl_ref = gcnt_ref = None
        idx_ref, ovf_ref = refs
    g = pl.program_id(1)
    gy0 = g * rpg
    tiles = rpg * n_tx

    def z(i, _):
        idx_ref[0, i, 0] = 0
        return 0

    # Static trip count: block to amortize the ~40-60-cycle scalar-loop
    # machinery (docs/DESIGN.md §12) over 8 stores per branch. (Mosaic's
    # fori_loop only supports full unroll, hence manual blocking.)
    _blocked_fori(tiles, 8, z, 0)

    if coarse:
        band = (g * rpg) // rpt
        n_walk = gcnt_ref[0, band, 0]
        get = lambda k: gl_ref[0, band, k]  # noqa: E731
    else:
        n_walk = N
        get = lambda k: k  # noqa: E731

    def per_splat(k, _):
        s = get(k)
        a = jnp.maximum(rng_ref[0, 2, s] - gy0, 0)
        b = jnp.minimum(rng_ref[0, 3, s] - gy0, rpg - 1)
        if corner_x:
            # corner-culled per-band column range (_corner_band_xranges):
            # two extra scalar loads per (splat, group) buy the band's
            # ellipse-corner column trim — txh < txl => npairs <= 0 below
            tx0 = cxr_ref[0, 0, 0, s]
            tx1 = cxr_ref[0, 0, 1, s]
        else:
            tx0 = rng_ref[0, 0, s]
            tx1 = rng_ref[0, 1, s]
        # One FUSED loop over this splat's (row, col) cover instead of
        # nested row/col fori_loops: a Mosaic scalar loop costs ~40-60
        # cycles of machinery per iteration (docs/DESIGN.md §12) and the
        # nested form pays it per row AND per column; carrying the tile
        # index with a wrap select and unrolling 2 pairs per iteration
        # halves the per-pair overhead again. npairs <= 0 (splat misses
        # this group, or the (1, -1) dead-splat sentinel box -> nx == 0)
        # skips the loop entirely.
        nx = tx1 - tx0 + 1
        npairs = (b - a + 1) * nx
        row_step = n_tx - nx + 1  # tile-index advance on row wrap

        def append(tl):
            q = idx_ref[0, tl, 0]

            @pl.when(q < cap)
            def _():
                idx_ref[0, tl, q + 1] = s

            idx_ref[0, tl, 0] = q + 1

        def step(tl, c):
            wrap = c >= tx1
            return (
                jnp.where(wrap, tl + row_step, tl + 1),
                jnp.where(wrap, tx0, c + 1),
            )

        PW = 4  # pairs per loop iteration (PW=8 measured slower: the
        # tail's per-pair @pl.when predication outweighs the extra
        # machinery amortization — 18.7 vs 16.7 ms binning at 4k²/50k)

        def pairw(i, st):
            tl, c = st
            append(tl)  # pair PW*i always exists (trip count = ceil/PW)
            for k in range(1, PW):
                tl, c = step(tl, c)

                @pl.when(PW * i + k < npairs)  # tail: last iter is partial
                def _(tl=tl):
                    append(tl)

            return step(tl, c)

        jax.lax.fori_loop(0, (npairs + PW - 1) // PW, pairw, (a * n_tx + tx0, tx0))
        return 0

    jax.lax.fori_loop(0, n_walk, per_splat, 0)

    def finish(i, mx):
        q_true = idx_ref[0, i, 0]  # pre-clamp = true per-tile splat count
        q = jnp.minimum(q_true, cap)
        idx_ref[0, i, 0] = q

        # pad_slots is static: unrolled predicated stores instead of a
        # dynamic fori_loop (saves the loop machinery per sentinel).
        for j in range(pad_slots):

            @pl.when(q + j < cap)
            def _(j=j):
                idx_ref[0, i, q + 1 + j] = N

        return jnp.maximum(mx, q_true)

    # Max true count in this group: the caller falls back to the dense
    # path when any tile exceeds cap (silent truncation would break the
    # binning-equality invariant whenever cap < the requested capacity).
    ovf_ref[0, 0, 0, 0] = _blocked_fori(tiles, 4, finish, 0)


def _bin_splats_scatter(
    x0, x1, y0, y1, n_tx: int, n_ty: int, tile_h: int, tile_w: int, cap: int,
    interpret: bool = False, pad_slots: int = _SCATTER_PAD,
    smem_budget: int = 176 * 1024, corner=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pair-proportional binning (see _bin_splats_xy). Tiles are processed
    in row-band groups sized so each group's lists fit SMEM; the per-tile
    capacity cap_s is derived from that budget (e.g. 175 per tile at
    4k^2 with the default 176 KiB — ~6x the average occupancy of an
    8k-splat chunk). When cap_s < cap, truncation would silently drop
    painter-ordered splats, so the kernel reports the max TRUE per-tile
    count and the call falls back (lax.cond) to the dense path whenever
    any tile overflows — results are identical to dense (without corner;
    with the band-level corner cull the fallback's per-tile cull is
    sharper, same ε class).

    `corner` (fast mode, opt-in): the vectorized band-level corner cull —
    per-(coarse band, splat) tile-column ranges from _corner_band_xranges,
    read by the fine walk instead of the box's column range, plus a
    band-list prefilter for fully-culled splats. Two-level mode only."""
    B, N = x0.shape

    budget = smem_budget  # SMEM bytes for one group's lists (2x buffered)
    # Smallest groups whose count still fits two-level's _N_COARSE bands
    # (re-walk factor 1) maximize per-tile capacity under the budget.
    rpg = max(1, _cdiv(n_ty, _N_COARSE))
    # Mosaic block constraint: the idx block's second-to-last dim (tiles
    # per group) must divide by 8 unless there is only one group.
    while rpg < n_ty and _cdiv(n_ty, rpg) > 1 and (rpg * n_tx) % 8 != 0:
        rpg += 1
    rpg = min(rpg, n_ty)
    # -1: column 0 of each tile row holds the running count.
    cap_s = min(cap, budget // (rpg * n_tx * 4) - 1)
    if cap_s < max(16, pad_slots):
        # Budget too small for this tile grid (tiny-budget tests, extreme
        # aspect ratios): the scatter kernel can't hold a useful list, so
        # bin densely. Static decision — all shapes are known at trace time.
        return _bin_splats_dense(
            x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, cap, corner=corner
        )

    rng = jnp.stack(
        [x0 // tile_w, x1 // tile_w, y0 // tile_h, y1 // tile_h], axis=1
    ).astype(jnp.int32)
    n_groups = _cdiv(n_ty, rpg)
    tiles = rpg * n_tx
    T = n_ty * n_tx

    in_specs = [
        pl.BlockSpec((1, 4, N), lambda b, g: (b, 0, 0), memory_space=pltpu.SMEM)
    ]
    args = [rng]
    # With many groups, a single-level scatter re-walks all N splats per
    # group (n_groups * N tests dominate). Two-level: one coarse walk bins
    # splats into <= _N_COARSE row-band lists; each fine group then walks
    # only its band's list, making total work ~2x the pair count.
    cap_g = _cdiv(N, 128) * 128  # >= N (lossless) and lane-aligned
    two_level = n_groups > 1 and cap_g <= 8192
    corner_x = corner is not None and two_level  # band cull needs bands
    if two_level:
        # n_groups <= _N_COARSE by construction above, so coarse bands
        # coincide with fine groups (re-walk factor 1).
        rpt = rpg
        keep = None
        if corner_x:
            txl, txh = _corner_band_xranges(
                corner, x0, x1, y0, y1, rpt * tile_h, tile_w
            )
            keep = txl <= txh  # band prefilter: fully-culled => not walked
        gl, gcnt = _band_lists_xla(rng[:, 2], rng[:, 3], n_ty, rpt, cap_g, keep)
        in_specs += [
            pl.BlockSpec(
                (1, _N_COARSE, cap_g), lambda b, g: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, _N_COARSE, 1), lambda b, g: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ]
        args += [gl, gcnt]
        if corner_x:
            # per-(band, splat) culled column ranges; bands == groups, so
            # each fine group reads exactly its band's (1, 1, 2, N) slice
            # (the walk only loads s < N from the band's true-count list,
            # so no sentinel column is needed)
            cxr = jnp.stack([txl, txh], axis=2)  # [B, C, 2, N] i32
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 2, N), lambda b, g: (b, g, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
            args.append(cxr)

    idx1, ovf = pl.pallas_call(
        functools.partial(
            _scatter_bin_kernel, n_tx=n_tx, rpg=rpg, cap=cap_s, N=N,
            coarse=two_level, rpt=rpt if two_level else 0,
            cap_g=cap_g if two_level else 0, pad_slots=pad_slots,
            corner_x=corner_x,
        ),
        grid=(B, n_groups),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, tiles, cap_s + 1), lambda b, g: (b, g, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 1), lambda b, g: (b, g, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_groups * tiles, cap_s + 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n_groups, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    idx = idx1[:, :T, 1:]
    cnt = idx1[:, :T, 0]
    if cap_s >= cap:
        # cap_s == cap: truncation at cap is the documented rule (same as
        # dense) — no correctness gap, no fallback needed.
        return idx, cnt
    idx = jnp.concatenate(
        [idx, jnp.full((B, T, cap - cap_s), N, jnp.int32)], axis=-1
    )
    # Any tile whose TRUE count exceeds cap_s lost painter-ordered splats
    # the caller's cap would have kept -> recompute densely. The predicate
    # stays on device (no host sync); the dense branch only executes (and
    # only then allocates its [B, T, N] temporaries) on overflow.
    overflowed = jnp.max(ovf) > cap_s
    return jax.lax.cond(
        overflowed,
        # corner threads through: the fallback culls at per-TILE
        # granularity (sharper than the band cull) — both are inside the
        # fast contract's ε class, same as the dense-vs-scatter rule
        lambda _: _bin_splats_dense(
            x0, x1, y0, y1, n_tx, n_ty, tile_h, tile_w, cap,
            corner=corner if corner_x else None,
        ),
        lambda _: (idx, cnt),
        operand=None,
    )


def _composite_tile(
    cnt_ref, idx_ref, feats_ref, n_tx, tile_h, tile_w, background,
    compute_dtype=jnp.float32, unroll=8, init_ref=None, turbo=False,
):
    """Shared hot loop: sequentially "over"-blend this tile's splat list
    onto the background. Returns the clamped (r, g, b) planes (f32).

    The walk is unrolled `unroll` splats per fori_loop step: the blend is a
    true sequential dependence, but the quadratic form / exp / mask of the
    next splats are independent, so unrolling lets Mosaic overlap their
    SMEM scalar loads and VPU work with the previous blend (the per-splat
    fixed cost — measured ~50 cycles — was on par with the vector math).
    The list is sentinel-padded (see _splat_feats_fast) so overshooting cnt
    by up to unroll-1 entries is an exact no-op.

    compute_dtype=bfloat16 runs the quadratic form, exp, and blend in bf16
    (the reference sketched the same trade with its unused use_fp16_canvas
    flag, modules/render.py:213, 235) — kept as a tested mode though
    measured no faster on v5e (the VPU is f32-native); exact f32 is the
    default and matches the oracle bit-for-bit.

    turbo=True consumes the _splat_feats_turbo table instead: exp2 with
    log2e/log2-alpha folded into the parameters, open-interval f32
    threshold mask, and a subtract-FMA blend C' = C + f*(c - C) — ~4 fewer
    VPU issues per pair (+8% measured at 512 splats / 512^2, the walk is
    vector-issue-bound, docs/DESIGN.md §2), ~5e-5 max canvas error.
    """
    t = pl.program_id(1)
    tx0 = (t % n_tx) * tile_w
    ty0 = (t // n_tx) * tile_h
    dt = compute_dtype

    xi = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + tx0
    yi = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + ty0
    xf = xi.astype(jnp.float32)
    yf = yi.astype(jnp.float32)

    cnt = cnt_ref[0, 0, 0, 0]

    def blend_one_turbo(k, canvas):
        cr, cg, cb = canvas
        s = idx_ref[0, 0, 0, k]
        cx = feats_ref[0, _F_CX, s]
        cy = feats_ref[0, _F_CY, s]
        nsxx = feats_ref[0, _F_SXX, s]  # -0.5*log2e*sxx
        nsxy = feats_ref[0, _F_SXY, s]  # -log2e*sxy
        nsyy = feats_ref[0, _F_SYY, s]  # -0.5*log2e*syy
        rc = feats_ref[0, _F_R, s]
        gc = feats_ref[0, _F_G, s]
        bc = feats_ref[0, _F_B, s]
        la = feats_ref[0, _F_A, s]  # log2(alpha); -inf when alpha = 0
        x0 = feats_ref[0, _F_X0, s]  # open-interval thresholds (x0-1 etc.)
        x1 = feats_ref[0, _F_X1, s]
        y0 = feats_ref[0, _F_Y0, s]
        y1 = feats_ref[0, _F_Y1, s]
        qx = xf - cx
        qy = yf - cy
        f = jnp.exp2(nsxx * (qx * qx) + (nsxy * (qx * qy) + (nsyy * (qy * qy) + la)))
        m = (xf > x0) & (xf < x1) & (yf > y0) & (yf < y1)
        f = jnp.where(m, f, 0.0)
        return (
            cr + f * (rc - cr),
            cg + f * (gc - cg),
            cb + f * (bc - cb),
        )

    def blend_one(k, canvas):
        if turbo:
            return blend_one_turbo(k, canvas)
        cr, cg, cb = canvas
        s = idx_ref[0, 0, 0, k]
        cx = feats_ref[0, _F_CX, s]
        cy = feats_ref[0, _F_CY, s]
        nsxx = feats_ref[0, _F_SXX, s]  # -0.5*sxx (pre-folded, exact)
        nsxy = feats_ref[0, _F_SXY, s]  # -sxy
        nsyy = feats_ref[0, _F_SYY, s]  # -0.5*syy
        rc = feats_ref[0, _F_R, s]
        gc = feats_ref[0, _F_G, s]
        bc = feats_ref[0, _F_B, s]
        a = feats_ref[0, _F_A, s]
        x0 = feats_ref[0, _F_X0, s]
        x1 = feats_ref[0, _F_X1, s]
        y0 = feats_ref[0, _F_Y0, s]
        y1 = feats_ref[0, _F_Y1, s]

        # Centered offsets in f32 (qx spans the canvas; bf16 would lose
        # pixel resolution), then the quadratic form in compute_dtype.
        # Scalar arithmetic stays f32 (Mosaic has no scalar bf16 ALU ops);
        # scalars are cast exactly once where they broadcast into vectors.
        qx = (xf - cx).astype(dt)
        qy = (yf - cy).astype(dt)
        quad = (
            nsxx.astype(dt) * (qx * qx)
            + nsxy.astype(dt) * (qx * qy)
            + nsyy.astype(dt) * (qy * qy)
        )
        f = jnp.exp(quad) * a.astype(dt)

        # AABB truncation (render.py:175-177). Unconditional: a scalar
        # branch skipping it for fully-covering splats was measured slower
        # than the 8 vector ops it saves (branches defeat pipelining).
        m = (xf >= x0) & (xf <= x1) & (yf >= y0) & (yf <= y1)
        f = jnp.where(m, f, jnp.asarray(0.0, dt))

        one_m_f = jnp.asarray(1.0, dt) - f
        return (
            one_m_f * cr + f * rc.astype(dt),
            one_m_f * cg + f * gc.astype(dt),
            one_m_f * cb + f * bc.astype(dt),
        )

    if init_ref is not None:
        # Chained pass: start from the previous splat-chunk's canvas (the
        # "over" composite is associative in painter order, so chunking
        # splats into sequential passes is exact — used when the parameter
        # table for all N splats exceeds SMEM).
        init = (
            init_ref[0, 0].astype(dt),
            init_ref[0, 1].astype(dt),
            init_ref[0, 2].astype(dt),
        )
    else:
        bg = background
        init = (
            jnp.full((tile_h, tile_w), bg[0], dt),
            jnp.full((tile_h, tile_w), bg[1], dt),
            jnp.full((tile_h, tile_w), bg[2], dt),
        )

    def chunk_body(c, canvas):
        base = c * unroll
        for j in range(unroll):  # static unroll
            canvas = blend_one(base + j, canvas)
        return canvas

    n_chunks = (cnt + unroll - 1) // unroll
    cr, cg, cb = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    return (
        jnp.clip(cr.astype(jnp.float32), 0.0, 1.0),
        jnp.clip(cg.astype(jnp.float32), 0.0, 1.0),
        jnp.clip(cb.astype(jnp.float32), 0.0, 1.0),
    )


def _render_tile_kernel(
    cnt_ref,  # (1, 1, 1, 1) SMEM int32
    idx_ref,  # (1, 1, 1, cap+unroll) SMEM int32
    feats_ref,  # (1, 13, N+1) SMEM f32
    *refs,  # [init_ref (1, 3, th, tw) VMEM if has_init,] out_ref
    n_tx: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    unroll: int = 8,
    has_init: bool = False,
    turbo: bool = False,
):
    init_ref, out_ref = (refs[0], refs[1]) if has_init else (None, refs[0])
    cr, cg, cb = _composite_tile(
        cnt_ref, idx_ref, feats_ref, n_tx, tile_h, tile_w, background,
        unroll=unroll, init_ref=init_ref, turbo=turbo,
    )
    out_ref[0, 0] = cr
    out_ref[0, 1] = cg
    out_ref[0, 2] = cb


def _fitness_tile_kernel(
    cnt_ref,  # (1, 1, 1, 1) SMEM int32
    idx_ref,  # (1, 1, 1, cap+unroll) SMEM int32
    feats_ref,  # (1, 13, N+1) SMEM f32
    target_ref,  # (3, tile_h, tile_w) VMEM f32 (broadcast over batch)
    weff_ref,  # (tile_h, tile_w) VMEM f32 (0 on canvas padding)
    *refs,  # [init_ref (1, 3, th, tw) VMEM if has_init,] out_ref (1,1,1,1)
    n_tx: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    compute_dtype=jnp.float32,
    unroll: int = 8,
    has_init: bool = False,
    turbo: bool = False,
):
    """Fused render + masked-MSE partial: the candidate canvas never leaves
    VMEM (BASELINE.md: on-chip fitness). All three scoring modes of
    modules/fitness.py:18-31 reduce to sum(dif^2 * w_eff) / D with w_eff
    and the scalar D precomputed by the caller."""
    init_ref, out_ref = (refs[0], refs[1]) if has_init else (None, refs[0])
    cr, cg, cb = _composite_tile(
        cnt_ref, idx_ref, feats_ref, n_tx, tile_h, tile_w, background,
        compute_dtype=compute_dtype, unroll=unroll, init_ref=init_ref,
        turbo=turbo,
    )
    w = weff_ref[:, :]
    dr = cr - target_ref[0]
    dg = cg - target_ref[1]
    db = cb - target_ref[2]
    acc = jnp.sum((dr * dr + dg * dg + db * db) * w)
    out_ref[0, 0] = acc[None, None]  # VMEM stores need >= 2D values


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "k_sigma", "background", "bin_capacity", "tile_h", "tile_w",
        "interpret", "unroll", "precision", "cull_eps", "corner_cull",
    ),
)
def render_pallas(
    g9: jnp.ndarray,
    H: int,
    W: int,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    bin_capacity: Optional[int] = None,
    tile_h: int = 64,
    tile_w: int = 128,
    interpret: bool = False,
    unroll: int = 8,
    precision: str = "highest",  # "highest" (bit-exact) | "fast" (~5e-5)
    cull_eps: Optional[float] = None,  # fast-mode cull ε (None -> DEFAULT_CULL_EPS)
    corner_cull: bool = False,  # fast-mode rect-min corner cull (_corner_keep)
) -> jnp.ndarray:
    """Render renderer-format genomes [B, N, 9] (or [N, 9]) -> [B, H, W, 3].

    Same contract as ops/oracle.render_xla; bin_capacity < N trades
    exactness in overloaded tiles for binning memory (default N = lossless).
    """
    squeeze = g9.ndim == 2
    if squeeze:
        g9 = g9[None]
    B, N, C = g9.shape
    assert C >= codec.GENE_DIM
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)

    corner_eps = _corner_eps(precision, corner_cull, cull_eps)
    p = codec.preprocess(g9, H, W, k_sigma)
    if precision == "fast":
        p = _tighten_boxes(p, k_sigma, cull_eps)
    elif precision == "exact-tight":
        p = codec.tighten_boxes_exact(p, k_sigma)
    out, _ = _chunked_passes(
        p, H, W, tile_h, tile_w, tuple(float(c) for c in background),
        unroll, interpret, bin_capacity, keep_last=False, precision=precision,
        corner_eps=corner_eps,
    )

    img = jnp.transpose(out[:, :, :H, :W], (0, 2, 3, 1))
    return img[0] if squeeze else img


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "k_sigma", "background", "boost_only", "boost_beta",
        "bin_capacity", "tile_h", "tile_w", "interpret", "has_mask", "precision",
        "unroll", "cull_eps", "corner_cull",
    ),
)
def fitness_pallas(
    g9: jnp.ndarray,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    H: int,
    W: int,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    boost_only: bool = False,
    boost_beta: float = 1.0,
    bin_capacity: Optional[int] = None,
    tile_h: int = 64,
    tile_w: int = 128,
    interpret: bool = False,
    has_mask: Optional[bool] = None,  # derived; present for jit caching only
    # "highest" (f32, oracle-exact) | "fast" (exp2/threshold walk, ~5e-5,
    # +8% — see _splat_feats_turbo) | "bf16" (tested mode, not faster)
    precision: str = "highest",
    unroll: int = 8,
    cull_eps: Optional[float] = None,  # fast-mode cull ε (None -> DEFAULT_CULL_EPS)
    corner_cull: bool = False,  # fast-mode rect-min corner cull (_corner_keep)
) -> jnp.ndarray:
    """Fused render+fitness: renderer genomes [B, N, 9] -> fitness [B].

    Candidate canvases live only in VMEM tiles; HBM sees one partial sum
    per (candidate, tile). Matches ops/fitness.fitness_from_images on the
    rendered images for all three scoring modes.
    """
    if g9.ndim == 2:
        g9 = g9[None]
    B, N, C = g9.shape
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)

    target = target.astype(jnp.float32)
    # Effective per-pixel weight + scalar denominator per scoring mode
    # (modules/fitness.py:18-31); canvas padding gets w_eff = 0.
    if weight_mask is None:
        w_eff = jnp.ones((H, W), jnp.float32)
        denom = jnp.float32(H * W * 3)
    elif boost_only:
        w_eff = 1.0 + boost_beta * jnp.clip(weight_mask.astype(jnp.float32), 0.0, 1.0)
        denom = (jnp.mean(w_eff) + 1e-12) * (H * W * 3)
    else:
        w_eff = weight_mask.astype(jnp.float32)
        denom = jnp.sum(w_eff) + 1e-12

    bgt = tuple(float(c) for c in background)
    corner_eps = _corner_eps(precision, corner_cull, cull_eps)
    if precision == "fast" and _cdiv(N, _MAX_SMEM_SPLATS) <= 1:
        # Single-chunk fast path: preprocess + table build fused into one
        # Pallas op (_prep_turbo_pallas) — skips the ~50-op XLA chain whose
        # per-op dispatch latency costs ~1 ms/call on the attached TPU.
        prep = _prep_turbo_pallas(g9, H, W, k_sigma, interpret, cull_eps)
        num = _fitness_partials(
            None, target, w_eff, H, W, tile_h, tile_w, bgt, jnp.float32,
            unroll, interpret, bin_capacity, None, precision=precision,
            prep=prep, corner_eps=corner_eps,
        )
        return num / denom
    p = codec.preprocess(g9, H, W, k_sigma)
    if precision == "fast":
        p = _tighten_boxes(p, k_sigma, cull_eps)
    elif precision == "exact-tight":
        p = codec.tighten_boxes_exact(p, k_sigma)
    init_p, p_last = _chunked_passes(
        p, H, W, tile_h, tile_w, bgt, unroll, interpret, bin_capacity,
        keep_last=True, precision=precision, corner_eps=corner_eps,
    )
    num = _fitness_partials(
        p_last, target, w_eff, H, W, tile_h, tile_w, bgt,
        jnp.bfloat16 if precision == "bf16" else jnp.float32,
        unroll, interpret, bin_capacity, init_p, precision=precision,
        corner_eps=corner_eps,
    )
    return num / denom


def _fitness_partials(
    p: codec.SplatScreen,
    target: jnp.ndarray,  # [Hs, W, 3]
    w_eff: jnp.ndarray,  # [Hs, W]
    Hs: int,
    W: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    compute_dtype,
    unroll: int,
    interpret: bool,
    bin_capacity: Optional[int],
    init_p: Optional[jnp.ndarray],
    precision: str = "highest",
    prep: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    corner_eps: Optional[float] = None,
) -> jnp.ndarray:
    """Fused composite + weighted-SSE for one (final) splat chunk -> [B].

    `prep` short-circuits table construction with (ff, fi) from
    _prep_turbo_pallas (fast path) — p is then unused and may be None."""
    import math

    B, N = (prep[0].shape[0], prep[0].shape[2] - 1) if prep is not None else p.cx.shape
    n_tx = _cdiv(W, tile_w)
    n_ty = _cdiv(Hs, tile_h)
    T = n_tx * n_ty
    Hp, Wp = n_ty * tile_h, n_tx * tile_w
    cap = N if bin_capacity is None else min(bin_capacity, N)

    turbo = precision == "fast"
    ps = max(unroll, _SCATTER_PAD)  # see _render_padded: walk overshoot
    if prep is not None:
        ff, fi = prep
        feats = ff
        corner = None
        if corner_eps is not None:
            # the turbo table already holds the log2-folded quadratic
            # (_prep_turbo_kernel rows 0-4, 8) — slice, don't recompute
            corner = (
                ff[:, 0, :N], ff[:, 1, :N], ff[:, 2, :N], ff[:, 3, :N],
                ff[:, 4, :N], ff[:, 8, :N], math.log2(corner_eps),
            )
        bin_idx, cnt = _bin_splats_xy(
            fi[:, 0], fi[:, 1], fi[:, 2], fi[:, 3], n_tx, n_ty, tile_h, tile_w,
            cap, interpret, pad_slots=ps, corner=corner,
        )
    else:
        feats = _splat_feats_turbo(p) if turbo else _splat_feats_fast(p)
        bin_idx, cnt = _bin_splats(
            p, n_tx, n_ty, tile_h, tile_w, cap, interpret, pad_slots=ps,
            corner=None if corner_eps is None else _corner_params(p, corner_eps),
        )
    bin_idx = jnp.pad(bin_idx, ((0, 0), (0, 0), (0, unroll)), constant_values=N)

    target_p = jnp.zeros((3, Hp, Wp), jnp.float32)
    target_p = target_p.at[:, :Hs, :W].set(jnp.transpose(target, (2, 0, 1)))
    w_p = jnp.zeros((Hp, Wp), jnp.float32).at[:Hs, :W].set(w_eff)

    in_specs = [
        pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, cap + unroll), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, _NFEAT, N + 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (3, tile_h, tile_w),
            lambda b, t: (0, t // n_tx, t % n_tx),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_h, tile_w),
            lambda b, t: (t // n_tx, t % n_tx),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [cnt[:, :, None, None], bin_idx[:, :, None, :], feats, target_p, w_p]
    if init_p is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 3, tile_h, tile_w),
                lambda b, t: (b, 0, t // n_tx, t % n_tx),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(init_p)

    partials = pl.pallas_call(
        functools.partial(
            _fitness_tile_kernel,
            n_tx=n_tx,
            tile_h=tile_h,
            tile_w=tile_w,
            background=background,
            compute_dtype=compute_dtype,
            unroll=unroll,
            has_init=init_p is not None,
            turbo=turbo,
        ),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, 1), jnp.float32),
        interpret=interpret,
    )(*args)

    return jnp.sum(partials[:, :, 0, 0], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "k_sigma", "background", "bin_capacity", "tile_h", "tile_w",
        "interpret", "unroll", "precision", "cull_eps", "corner_cull",
    ),
)
def fitness_pallas_partial(
    g9: jnp.ndarray,
    target_slab: jnp.ndarray,  # [Hs, W, 3] this device's canvas rows
    w_slab: jnp.ndarray,  # [Hs, W] effective weights (0 where excluded)
    H: int,
    W: int,
    y_origin: jnp.ndarray,  # int32 scalar: global row of slab row 0
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    bin_capacity: Optional[int] = None,
    tile_h: int = 64,
    tile_w: int = 128,
    interpret: bool = False,
    unroll: int = 8,
    precision: str = "highest",  # "highest" (f32) | "fast" (~5e-5) | "bf16"
    cull_eps: Optional[float] = None,  # fast-mode cull ε (None -> DEFAULT_CULL_EPS)
    corner_cull: bool = False,  # fast-mode rect-min corner cull (_corner_keep)
) -> jnp.ndarray:
    """Row-slab partial of the fused fitness: sum(dif^2 * w) over the slab.

    The tile-sharded building block (SURVEY.md §2.4: canvas rows are this
    domain's sequence axis): each device renders only its H/ntile rows and
    the partials psum over the tile mesh axis. Splats are preprocessed
    against the GLOBAL canvas (H, W) and then shifted down by y_origin —
    integer row offsets subtract exactly in f32 (all quantities < 2^24), so
    qy and the AABB tests are bit-identical to the full-canvas kernel and
    the psummed fitness matches the single-chip fused path to reduction
    rounding. Out-of-slab splats bin to no local tile (the tile-range
    overlap test handles negative shifted rows).
    """
    if g9.ndim == 2:
        g9 = g9[None]
    B, N, _ = g9.shape
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)
    Hs = target_slab.shape[0]

    p = codec.preprocess(g9, H, W, k_sigma)
    yo_i = y_origin.astype(p.y0.dtype)
    p = p._replace(
        cy=p.cy - y_origin.astype(jnp.float32),
        y0=p.y0 - yo_i,
        y1=p.y1 - yo_i,
    )
    if precision == "fast":
        p = _tighten_boxes(p, k_sigma, cull_eps)  # intersection inherits the shift
    elif precision == "exact-tight":
        p = codec.tighten_boxes_exact(p, k_sigma)  # same shift inheritance
    # Corner cull (round-4 verdict missing #3): _corner_params reads the
    # SHIFTED SplatScreen, so the rect-min test runs in slab coordinates —
    # the same tile rects the slab's walk masks against. Per-chip culled
    # work now matches the single-chip fused kernel's.
    corner_eps = _corner_eps(precision, corner_cull, cull_eps)
    bgt = tuple(float(c) for c in background)
    init_p, p_last = _chunked_passes(
        p, Hs, W, tile_h, tile_w, bgt, unroll, interpret, bin_capacity,
        keep_last=True, precision=precision, corner_eps=corner_eps,
    )
    return _fitness_partials(
        p_last, target_slab.astype(jnp.float32), w_slab.astype(jnp.float32),
        Hs, W, tile_h, tile_w, bgt,
        jnp.bfloat16 if precision == "bf16" else jnp.float32, unroll, interpret,
        bin_capacity, init_p, precision=precision, corner_eps=corner_eps,
    )


def render_rows_pallas(
    g9: jnp.ndarray,
    H: int,
    W: int,
    y_origin: jnp.ndarray,  # int32 scalar: global row of slab row 0
    out_rows: int,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    bin_capacity: Optional[int] = None,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
    unroll: int = 8,
    precision: str = "highest",
    cull_eps: Optional[float] = None,  # fast-mode cull ε (None -> DEFAULT_CULL_EPS)
    corner_cull: bool = False,  # fast-mode rect-min corner cull (_corner_keep)
) -> jnp.ndarray:
    """Render `out_rows` canvas rows starting at y_origin -> [B, rows, W, 3].

    The image-producing sibling of fitness_pallas_partial (same exact
    row-shift argument): the row-slab building block for sharded metrics
    that need the canvas itself (e.g. the halo-exchange SSIM partial,
    ops/objective._evaluate_metric_sharded). Rows beyond the global canvas
    (y_origin + r >= H) render as background — callers mask them.
    """
    if g9.ndim == 2:
        g9 = g9[None]
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)

    p = codec.preprocess(g9, H, W, k_sigma)
    yo_i = y_origin.astype(p.y0.dtype)
    p = p._replace(
        cy=p.cy - y_origin.astype(jnp.float32),
        y0=p.y0 - yo_i,
        y1=p.y1 - yo_i,
    )
    if precision == "fast":
        p = _tighten_boxes(p, k_sigma, cull_eps)  # intersection inherits the shift
    elif precision == "exact-tight":
        p = codec.tighten_boxes_exact(p, k_sigma)  # same shift inheritance
    th = next((t for t in (64, 32, 16, 8) if out_rows % t == 0), None)
    tile_h = th if th is not None else tile_h
    out, _ = _chunked_passes(
        p, out_rows, W, tile_h, tile_w, tuple(float(c) for c in background),
        unroll, interpret, bin_capacity, keep_last=False, precision=precision,
        corner_eps=_corner_eps(precision, corner_cull, cull_eps),
    )
    return jnp.transpose(out[:, :, :out_rows, :W], (0, 2, 3, 1))


def max_bin_count(
    g9: jnp.ndarray, H: int, W: int, k_sigma: float = 3.0, tile_h: int = 16, tile_w: int = 128
) -> jnp.ndarray:
    """Diagnostic: the largest per-tile splat count for these genomes — the
    minimum lossless bin_capacity."""
    if g9.ndim == 2:
        g9 = g9[None]
    p = codec.preprocess(g9.astype(jnp.float32), H, W, k_sigma)
    n_tx = _cdiv(W, tile_w)
    n_ty = _cdiv(H, tile_h)
    _, cnt = _bin_splats(p, n_tx, n_ty, tile_h, tile_w, g9.shape[1])
    return jnp.max(cnt)
