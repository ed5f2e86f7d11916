"""Differentiable Pallas renderer: custom-VJP forward/backward kernel pair.

The reference has no backward at all (every module is @torch.no_grad,
SURVEY.md). This module gives the Pallas rasterizer an EXACT, analytic,
division-free backward pass through the order-dependent "over" compositing
(the hard part flagged in SURVEY.md §7):

Forward (per pixel, ascending splat index i over the tile's bin list):
    C_i = (1 - f_i) C_{i-1} + f_i c_i,   f_i = a_i e_i,
    e_i = exp(-0.5 q_i) * [pixel in AABB_i]
Closed-form pullbacks with T_i = prod_{j>i} (1 - f_j):
    dL/df_i = sum_c g_c T_i (c_{i,c} - C_{i-1,c})
    dL/dc_{i,c} = sum_px g_c T_i f_i
    dL/da_i = sum_px dL/df_i * e_i ;  dL/dq_i = -0.5 f_i dL/df_i
    dq/dcx = -(2 sxx qx + 2 sxy qy),  dq/dsxx = qx^2,  etc.

Stability: some f_i can be exactly 1 (alpha = 255 at the center), so the
3DGS-style division by (1 - f_i) is not available. Instead the backward
kernel does a two-level rematerialization: a forward replay stores canvases
at S-splat chunk boundaries in VMEM scratch; each chunk is then replayed
forward (storing its e-planes and per-splat prefix canvases) and walked
backward maintaining the suffix transmittance T multiplicatively — no
divisions anywhere.

Gradients accumulate per-splat in an SMEM output block that persists across
the tile grid dimension (initialized via input_output_aliases with zeros),
then chain through codec.preprocess / genome_to_renderer by ordinary JAX
VJP — so `jax.grad` through render_pallas_diff agrees with the oracle's
autodiff.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import codec
from .render_pallas import (
    _NFEAT,
    _bin_splats,
    _cdiv,
    _corner_params,
    _render_tile_kernel,
    _splat_feats,
    _splat_feats_fast,
    _tighten_boxes,
)

_FWD_UNROLL = 8  # forward kernel walk unroll (see render_pallas._composite_tile)

_NGRAD = 9  # dcx, dcy, dsxx, dsxy, dsyy, drc, dgc, dbc, da
_CHUNK = 32  # backward remat chunk (splats per stored boundary canvas)


def _bwd_tile_kernel(
    cnt_ref,  # (1, 1, 1, 1) SMEM i32
    idx_ref,  # (1, 1, 1, cap) SMEM i32
    feats_ref,  # (1, 13, N1) SMEM f32 (row N = sentinel zeros)
    *refs,  # see unpacking below (differs by mode)
    n_tx: int,
    tile_h: int,
    tile_w: int,
    background: Tuple[float, float, float],
    cap: int,
    chunk: int,
    has_init: bool = False,
    fused: bool = False,
):
    # grad_ref: (1, 9, N1) SMEM accumulator (persists across tiles).
    #
    # Plain VJP mode (fused=False): gimg_ref (1,3,th,tw) VMEM holds the
    # upstream image cotangent. With has_init (a chained splat-chunk pass,
    # see render_pallas _chunked_passes): init_ref holds the previous
    # pass's canvas and dinit_ref receives its cotangent g * T_total
    # (T_total = suffix transmittance through this whole chunk) so JAX
    # chains passes.
    #
    # Fused loss+grad mode (fused=True): instead of an upstream cotangent,
    # the kernel receives the target tile, a weight plane, and a cotangent
    # scale; after the forward replay it computes the weighted-SSE partial
    # (accumulated into num_ref across tiles) and the image cotangent
    # g = scale * w * (clip(canvas) - target) ON-CHIP, then runs the same
    # backward walk. One kernel = forward + loss + backward with zero
    # image/cotangent HBM traffic. (Storing boundary canvases to HBM from
    # a separate forward kernel was measured SLOWER than this: the
    # ~2*mc*3*H*W*4-byte round trip cancels the saved replay pass.)
    if fused:
        tgt_ref, wgt_ref, scale_ref = refs[0], refs[1], refs[2]
        num_ref, grad_ref = refs[3], refs[4]
        cbound_ref, ebuf_ref, cprev_ref = refs[5], refs[6], refs[7]
        gimg_ref = init_ref = dinit_ref = None
    elif has_init:
        gimg_ref, init_ref, grad_ref, dinit_ref = refs[0], refs[1], refs[2], refs[3]
        cbound_ref, ebuf_ref, cprev_ref = refs[4], refs[5], refs[6]
    else:
        init_ref, dinit_ref = None, None
        gimg_ref, grad_ref = refs[0], refs[1]
        cbound_ref, ebuf_ref, cprev_ref = refs[2], refs[3], refs[4]
    t = pl.program_id(1)
    n1 = grad_ref.shape[2]

    # The accumulator block persists across the tile grid dimension (its
    # index map is constant in t); zero it at the first tile of each batch.
    @pl.when(t == 0)
    def _():
        def z(i, _):
            for r in range(_NGRAD):
                grad_ref[0, r, i] = 0.0
            return 0

        jax.lax.fori_loop(0, n1, z, 0)
        if fused:
            num_ref[0, 0, 0] = 0.0

    tx0 = (t % n_tx) * tile_w
    ty0 = (t // n_tx) * tile_h
    xf = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + tx0).astype(jnp.float32)
    yf = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + ty0).astype(jnp.float32)

    cnt = cnt_ref[0, 0, 0, 0]
    n_chunks = pl.cdiv(cnt, chunk)
    S = chunk
    U = 8  # static unroll of the replay/backward walks (S % U == 0);
    # overshooting cnt inside a chunk lands on the sentinel splat
    # (alpha 0) whose contributions and grads are zero (grad row N is
    # dropped by the caller), so unrolled steps need no bounds checks.

    def load_splat(k):
        s = idx_ref[0, 0, 0, k]
        return s, (
            feats_ref[0, 0, s], feats_ref[0, 1, s], feats_ref[0, 2, s],
            feats_ref[0, 3, s], feats_ref[0, 4, s], feats_ref[0, 5, s],
            feats_ref[0, 6, s], feats_ref[0, 7, s], feats_ref[0, 8, s],
            feats_ref[0, 9, s], feats_ref[0, 10, s], feats_ref[0, 11, s],
            feats_ref[0, 12, s],
        )

    def masked_exp(cx, cy, sxx, sxy, syy, x0, x1, y0, y1):
        qx = xf - cx
        qy = yf - cy
        quad = sxx * (qx * qx) + 2.0 * sxy * (qx * qy) + syy * (qy * qy)
        m = (xf >= x0) & (xf <= x1) & (yf >= y0) & (yf <= y1)
        return jnp.where(m, jnp.exp(-0.5 * quad), 0.0), qx, qy

    # ---- Pass A: forward replay, storing chunk-boundary canvases ----
    if has_init:
        cbound_ref[0, 0] = init_ref[0, 0]
        cbound_ref[0, 1] = init_ref[0, 1]
        cbound_ref[0, 2] = init_ref[0, 2]
    else:
        bg = background
        cbound_ref[0, 0] = jnp.full((tile_h, tile_w), bg[0], jnp.float32)
        cbound_ref[0, 1] = jnp.full((tile_h, tile_w), bg[1], jnp.float32)
        cbound_ref[0, 2] = jnp.full((tile_h, tile_w), bg[2], jnp.float32)

    def chunk_fwd(c, canvas):
        cr, cg, cb = canvas

        def one(k, cv):
            cr, cg, cb = cv
            _, (cx, cy, sxx, sxy, syy, rc, gc, bc, a, x0, x1, y0, y1) = load_splat(k)
            e, _, _ = masked_exp(cx, cy, sxx, sxy, syy, x0, x1, y0, y1)
            f = a * e
            omf = 1.0 - f
            return (omf * cr + f * rc, omf * cg + f * gc, omf * cb + f * bc)

        def body(jc, cv):
            for u in range(U):  # static unroll
                cv = one(c * S + jc * U + u, cv)
            return cv

        cr, cg, cb = jax.lax.fori_loop(0, S // U, body, (cr, cg, cb))
        cbound_ref[c + 1, 0] = cr
        cbound_ref[c + 1, 1] = cg
        cbound_ref[c + 1, 2] = cb
        return (cr, cg, cb)

    fr, fg, fb = jax.lax.fori_loop(
        0, n_chunks, chunk_fwd, (cbound_ref[0, 0], cbound_ref[0, 1], cbound_ref[0, 2])
    )

    # ---- Image cotangent planes ----
    if fused:
        # On-chip loss head: clip the just-rendered canvas (matching the
        # primal renderer's final clamp), diff against the target tile,
        # accumulate the weighted-SSE partial, and form the cotangent.
        # The weight plane is zero on canvas padding, so padded pixels
        # contribute neither loss nor gradient.
        w = wgt_ref[0, 0]
        scale = scale_ref[0, 0]
        dr = jnp.clip(fr, 0.0, 1.0) - tgt_ref[0, 0]
        dg = jnp.clip(fg, 0.0, 1.0) - tgt_ref[0, 1]
        db = jnp.clip(fb, 0.0, 1.0) - tgt_ref[0, 2]
        num_ref[0, 0, 0] += jnp.sum(w * (dr * dr + dg * dg + db * db))
        sw = scale * w
        g0 = sw * dr
        g1 = sw * dg
        g2 = sw * db
    else:
        g0 = gimg_ref[0, 0]
        g1 = gimg_ref[0, 1]
        g2 = gimg_ref[0, 2]

    # ---- Pass B: reverse over chunks ----

    def chunk_bwd(ci, T_above):
        c = n_chunks - 1 - ci

        # B1: replay this chunk, storing e-planes and prefix canvases
        def replay_one(j, cv):
            cr, cg, cb = cv
            cprev_ref[j, 0] = cr
            cprev_ref[j, 1] = cg
            cprev_ref[j, 2] = cb
            k = c * S + j
            _, (cx, cy, sxx, sxy, syy, rc, gc, bc, a, x0, x1, y0, y1) = load_splat(k)
            e, _, _ = masked_exp(cx, cy, sxx, sxy, syy, x0, x1, y0, y1)
            ebuf_ref[j] = e
            f = a * e
            omf = 1.0 - f
            return (omf * cr + f * rc, omf * cg + f * gc, omf * cb + f * bc)

        def replay(jc, cv):
            for u in range(U):  # static unroll
                cv = replay_one(jc * U + u, cv)
            return cv

        jax.lax.fori_loop(
            0, S // U, replay, (cbound_ref[c, 0], cbound_ref[c, 1], cbound_ref[c, 2])
        )

        # B2: walk the chunk backward, maintaining suffix transmittance
        def bwd_one(j, T):
            k = c * S + j
            s, (cx, cy, sxx, sxy, syy, rc, gc, bc, a, x0, x1, y0, y1) = load_splat(k)
            e = ebuf_ref[j]
            # only the centered offsets are needed here — e (incl. the
            # quad/exp/mask work) was stored by the replay above; where the
            # mask zeroed e, every grad term below carries the e (or f)
            # factor, so the contributions vanish without re-masking.
            qx = xf - cx
            qy = yf - cy
            f = a * e

            gT0 = g0 * T
            gT1 = g1 * T
            gT2 = g2 * T
            dLdf = (
                gT0 * (rc - cprev_ref[j, 0])
                + gT1 * (gc - cprev_ref[j, 1])
                + gT2 * (bc - cprev_ref[j, 2])
            )
            d_rc = jnp.sum(gT0 * f)
            d_gc = jnp.sum(gT1 * f)
            d_bc = jnp.sum(gT2 * f)
            d_a = jnp.sum(dLdf * e)
            dLdq = -0.5 * f * dLdf
            d_cx = jnp.sum(dLdq * (-2.0) * (sxx * qx + sxy * qy))
            d_cy = jnp.sum(dLdq * (-2.0) * (syy * qy + sxy * qx))
            d_sxx = jnp.sum(dLdq * qx * qx)
            d_sxy = jnp.sum(dLdq * 2.0 * qx * qy)
            d_syy = jnp.sum(dLdq * qy * qy)

            grad_ref[0, 0, s] += d_cx
            grad_ref[0, 1, s] += d_cy
            grad_ref[0, 2, s] += d_sxx
            grad_ref[0, 3, s] += d_sxy
            grad_ref[0, 4, s] += d_syy
            grad_ref[0, 5, s] += d_rc
            grad_ref[0, 6, s] += d_gc
            grad_ref[0, 7, s] += d_bc
            grad_ref[0, 8, s] += d_a
            return T * (1.0 - f)

        def bwd(jj, T):
            for u in range(U):  # static unroll
                T = bwd_one(S - 1 - (jj * U + u), T)
            return T

        return jax.lax.fori_loop(0, S // U, bwd, T_above)

    T_total = jax.lax.fori_loop(
        0, n_chunks, chunk_bwd, jnp.ones((tile_h, tile_w), jnp.float32)
    )
    if has_init:
        dinit_ref[0, 0] = g0 * T_total
        dinit_ref[0, 1] = g1 * T_total
        dinit_ref[0, 2] = g2 * T_total


@functools.lru_cache(maxsize=64)
def _make_screen_render(
    B: int,
    N: int,
    H: int,
    W: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    background: Tuple[float, float, float],
    interpret: bool,
    has_init: bool = False,
    corner_eps: Optional[float] = None,
):
    """Build the custom-VJP screen-space renderer for one static config.

    With has_init the renderer takes a previous pass's padded canvas
    [B, 3, Hp, Wp] as its first (differentiable) argument — the chained
    splat-chunk mechanism of render_pallas._chunked_passes, made
    differentiable: the backward kernel emits d(init) = g * T_total so JAX
    chains cotangents across passes.

    corner_eps (fast mode, round-4 verdict missing #2) applies the
    rect-min corner cull at BINNING time, exactly as the forward
    evaluator's _render_padded does: culled (tile, splat) pairs appear in
    no bin list, so the forward walk, both replay walks, AND the backward
    walk all skip them — the returned gradients are the exact analytic
    gradients OF the corner-culled render (the same self-consistency
    contract as the ε-tight boxes, DESIGN §8d), and a pair culled at
    binning contributes exactly zero gradient.
    """
    n_tx = _cdiv(W, tile_w)
    n_ty = _cdiv(H, tile_h)
    T = n_tx * n_ty
    Hp, Wp = n_ty * tile_h, n_tx * tile_w
    N1 = N + 1
    cap_pad = _cdiv(cap, _CHUNK) * _CHUNK
    max_chunks = cap_pad // _CHUNK

    def prep(arrs):
        """13 float arrays [B, N] -> (feats [B,13,N1], bin_idx, cnt).

        `feats` is the raw layout the backward kernel differentiates
        through; the forward kernel's pre-folded table is rebuilt from the
        same SplatScreen on demand (fwd_only) rather than saved as a
        residual.
        """
        p = _screen(arrs)
        feats = _splat_feats(p)  # [B, 13, N]
        feats = jnp.concatenate([feats, jnp.zeros((B, _NFEAT, 1), jnp.float32)], axis=2)
        bin_idx, cnt = _bin_splats(
            p, n_tx, n_ty, tile_h, tile_w, cap, interpret, pad_slots=40,
            corner=None if corner_eps is None else _corner_params(p, corner_eps),
        )
        if cap_pad > cap:
            bin_idx = jnp.concatenate(
                [bin_idx, jnp.full((B, T, cap_pad - cap), N, jnp.int32)], axis=-1
            )
        return feats, bin_idx, cnt

    def _screen(arrs):
        return codec.SplatScreen(
            cx=arrs[0], cy=arrs[1], sxx=arrs[2], sxy=arrs[3], syy=arrs[4],
            rc=arrs[5], gc=arrs[6], bc=arrs[7], a=arrs[8],
            x0=arrs[9].astype(jnp.int32), x1=arrs[10].astype(jnp.int32),
            y0=arrs[11].astype(jnp.int32), y1=arrs[12].astype(jnp.int32),
        )

    def fwd_only(arrs, bin_idx, cnt, init_p):
        # _render_tile_kernel expects the pre-folded table + sentinel and
        # walks the list _FWD_UNROLL entries at a time, so the idx lists
        # carry that much extra sentinel padding.
        feats_fast = _splat_feats_fast(_screen(arrs))
        bin_idx = jnp.pad(
            bin_idx, ((0, 0), (0, 0), (0, _FWD_UNROLL)), constant_values=N
        )
        in_specs = [
            pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, cap_pad + _FWD_UNROLL), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _NFEAT, N1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        ]
        args = [cnt[:, :, None, None], bin_idx[:, :, None, :], feats_fast]
        if has_init:
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
                n_tx=n_tx, tile_h=tile_h, tile_w=tile_w, background=background,
                unroll=_FWD_UNROLL, has_init=has_init,
            ),
            grid=(B, T),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 3, tile_h, tile_w),
                lambda b, t: (b, 0, t // n_tx, t % n_tx),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, 3, Hp, Wp), jnp.float32),
            interpret=interpret,
        )(*args)

    def bwd_grads(feats, bin_idx, cnt, g_img, init_p):
        in_specs = [
            pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, cap_pad), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _NFEAT, N1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 3, tile_h, tile_w),
                lambda b, t: (b, 0, t // n_tx, t % n_tx),
                memory_space=pltpu.VMEM,
            ),
        ]
        args = [cnt[:, :, None, None], bin_idx[:, :, None, :], feats, g_img]
        out_specs = [
            pl.BlockSpec((1, _NGRAD, N1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((B, _NGRAD, N1), jnp.float32)]
        if has_init:
            in_specs.append(
                pl.BlockSpec(
                    (1, 3, tile_h, tile_w),
                    lambda b, t: (b, 0, t // n_tx, t % n_tx),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(init_p)
            out_specs.append(
                pl.BlockSpec(
                    (1, 3, tile_h, tile_w),
                    lambda b, t: (b, 0, t // n_tx, t % n_tx),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((B, 3, Hp, Wp), jnp.float32))
        out = pl.pallas_call(
            functools.partial(
                _bwd_tile_kernel,
                n_tx=n_tx, tile_h=tile_h, tile_w=tile_w, background=background,
                cap=cap_pad, chunk=_CHUNK, has_init=has_init,
            ),
            grid=(B, T),
            in_specs=in_specs,
            out_specs=out_specs if has_init else out_specs[0],
            out_shape=out_shape if has_init else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((max_chunks + 1, 3, tile_h, tile_w), jnp.float32),
                pltpu.VMEM((_CHUNK, tile_h, tile_w), jnp.float32),
                pltpu.VMEM((_CHUNK, 3, tile_h, tile_w), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
        if has_init:
            grads, dinit = out
            return grads[:, :, :N], dinit
        return out[:, :, :N], None  # drop the sentinel row

    if has_init:

        @jax.custom_vjp
        def screen_render(init_p, *arrs):
            _, bin_idx, cnt = prep(arrs)
            return fwd_only(arrs, bin_idx, cnt, init_p)

        def screen_render_fwd(init_p, *arrs):
            feats, bin_idx, cnt = prep(arrs)
            return fwd_only(arrs, bin_idx, cnt, init_p), (feats, bin_idx, cnt, init_p)

        def screen_render_bwd(res, g_img):
            feats, bin_idx, cnt, init_p = res
            g, dinit = bwd_grads(feats, bin_idx, cnt, g_img, init_p)
            zero = jnp.zeros((B, N), jnp.float32)
            return (dinit,) + tuple(g[:, i] for i in range(_NGRAD)) + (
                zero, zero, zero, zero
            )

    else:

        @jax.custom_vjp
        def screen_render(*arrs):
            _, bin_idx, cnt = prep(arrs)
            return fwd_only(arrs, bin_idx, cnt, None)

        def screen_render_fwd(*arrs):
            feats, bin_idx, cnt = prep(arrs)
            return fwd_only(arrs, bin_idx, cnt, None), (feats, bin_idx, cnt)

        def screen_render_bwd(res, g_img):
            feats, bin_idx, cnt = res
            g, _ = bwd_grads(feats, bin_idx, cnt, g_img, None)
            zero = jnp.zeros((B, N), jnp.float32)
            # (cx, cy, sxx, sxy, syy, rc, gc, bc, a) + zero grads for the
            # integer-valued AABB floats (floor/ceil: zero derivative a.e.)
            return tuple(g[:, i] for i in range(_NGRAD)) + (zero, zero, zero, zero)

    screen_render.defvjp(screen_render_fwd, screen_render_bwd)
    return screen_render


@functools.lru_cache(maxsize=64)
def _make_screen_lossgrad(
    B: int,
    N: int,
    H: int,
    W: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    background: Tuple[float, float, float],
    interpret: bool,
    corner_eps: Optional[float] = None,
):
    """Build the fused loss+grad runner for one static config.

    Returns run(arrs, target, w_eff, scale) -> (num [B], grads [B, 9, N]):
    num = per-image sum_px(w_eff * sum_ch (clip(render) - target)^2) and
    grads = d(scale * num summed over B)/d(screen params), both from ONE
    kernel invocation per (image, tile) — forward walk with chunk-boundary
    canvases in VMEM scratch, on-chip loss head, backward walk (see
    _bwd_tile_kernel fused=True).
    """
    n_tx = _cdiv(W, tile_w)
    n_ty = _cdiv(H, tile_h)
    T = n_tx * n_ty
    Hp, Wp = n_ty * tile_h, n_tx * tile_w
    N1 = N + 1
    cap_pad = _cdiv(cap, _CHUNK) * _CHUNK
    max_chunks = cap_pad // _CHUNK

    def run(arrs, target, w_eff, scale):
        p = codec.SplatScreen(
            cx=arrs[0], cy=arrs[1], sxx=arrs[2], sxy=arrs[3], syy=arrs[4],
            rc=arrs[5], gc=arrs[6], bc=arrs[7], a=arrs[8],
            x0=arrs[9].astype(jnp.int32), x1=arrs[10].astype(jnp.int32),
            y0=arrs[11].astype(jnp.int32), y1=arrs[12].astype(jnp.int32),
        )
        feats = _splat_feats(p)  # raw layout: the backward differentiates it
        feats = jnp.concatenate([feats, jnp.zeros((B, _NFEAT, 1), jnp.float32)], axis=2)
        bin_idx, cnt = _bin_splats(
            p, n_tx, n_ty, tile_h, tile_w, cap, interpret, pad_slots=40,
            # same binning-time cull as _make_screen_render: all three walks
            # of the fused kernel share the culled lists, so loss and grads
            # describe the same corner-culled objective
            corner=None if corner_eps is None else _corner_params(p, corner_eps),
        )
        if cap_pad > cap:
            bin_idx = jnp.concatenate(
                [bin_idx, jnp.full((B, T, cap_pad - cap), N, jnp.int32)], axis=-1
            )
        tgt = jnp.transpose(target.astype(jnp.float32), (2, 0, 1))
        tgt = jnp.pad(tgt, ((0, 0), (0, Hp - H), (0, Wp - W)))[None]
        w = jnp.ones((H, W), jnp.float32) if w_eff is None else w_eff.astype(jnp.float32)
        w = jnp.pad(w, ((0, Hp - H), (0, Wp - W)))[None, None]
        sc = jnp.reshape(scale, (1, 1)).astype(jnp.float32)

        num, grads = pl.pallas_call(
            functools.partial(
                _bwd_tile_kernel,
                n_tx=n_tx, tile_h=tile_h, tile_w=tile_w, background=background,
                cap=cap_pad, chunk=_CHUNK, has_init=False, fused=True,
            ),
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, cap_pad), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _NFEAT, N1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 3, tile_h, tile_w),
                    lambda b, t: (0, 0, t // n_tx, t % n_tx),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, tile_h, tile_w),
                    lambda b, t: (0, 0, t // n_tx, t % n_tx),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                # (1, 1, 1) over (B, 1, 1): Mosaic requires the last TWO
                # block dims to divide (8, 128) or equal the array dims —
                # a 2-D (1, 1) block over (B, 1) fails that for B > 1
                # (only caught when COMPILED; interpret mode accepts it).
                pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _NGRAD, N1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, _NGRAD, N1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((max_chunks + 1, 3, tile_h, tile_w), jnp.float32),
                pltpu.VMEM((_CHUNK, tile_h, tile_w), jnp.float32),
                pltpu.VMEM((_CHUNK, 3, tile_h, tile_w), jnp.float32),
            ],
            interpret=interpret,
        )(cnt[:, :, None, None], bin_idx[:, :, None, :], feats, tgt, w, sc)
        return num[:, 0, 0], grads[:, :, :N]  # drop the sentinel row

    return run


def fused_value_and_grad(
    g_axes: jnp.ndarray,
    target: jnp.ndarray,
    weight_mask: Optional[jnp.ndarray],
    H: int,
    W: int,
    *,
    boost_only: bool = False,
    boost_beta: float = 1.0,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    bin_capacity: Optional[int] = None,
    tile_h: Optional[int] = None,
    tile_w: int = 128,
    interpret: bool = False,
    cull_eps: Optional[float] = None,
    corner_cull: bool = False,
    box: str = "reference",  # "reference" | "tight" (exact-tight tier)
):
    """Fused ((loss, fits), grads) for loss = mean(fitness(render(g), target)).

    Drop-in replacement for jax.value_and_grad(make_loss_fn(...)) on the
    single-device pallas path (models/gradient.py): one Pallas kernel per
    (image, tile) renders forward (boundary canvases in VMEM scratch),
    evaluates the scoring-mode loss head on-chip (fitness.weff_denom — the
    modes' single home), and walks backward — instead of the plain VJP's
    render kernel + XLA loss + backward kernel whose pass A re-replays the
    whole splat list. Saves one full forward replay AND the image +
    cotangent HBM round trips. Grads chain through codec.preprocess /
    genome_to_renderer by ordinary JAX VJP, exactly as render_pallas_diff.

    g_axes: [B, N, 9] axes-angle genomes; target: [H, W, 3];
    weight_mask: [H, W] or None (scoring modes per modules/fitness.py:8-31).
    Requires N <= render_pallas._MAX_SMEM_SPLATS (no chunk chaining) —
    callers gate and fall back to the unfused path.

    cull_eps (opt-in; None = exact reference-pinned boxes): tighten the
    AABBs with the fast-mode ε-contribution cull (_tighten_boxes, DESIGN
    §8c) BEFORE binning — the same pair reduction that bought the forward
    evaluator its fast-mode headline, applied to all three walks (replay,
    e-plane replay, backward) of this kernel. The returned grads are the
    EXACT analytic gradients OF the ε-culled render (self-consistent: the
    loss value and its gradient describe the same culled objective), NOT
    approximations of the exact-render gradients; in particular a splat
    with alpha <= ε is culled to an empty box and receives ZERO gradient,
    so fast-mode Adam cannot revive sub-ε splats (the GA's mutations can;
    pure-gradient fits should keep the exact default or validate per
    DESIGN §8d).

    corner_cull (needs cull_eps): additionally drop AABB-overlapping
    (tile, splat) pairs whose peak contribution on the shared pixel rect
    stays under ε (render_pallas._corner_keep) — the forward evaluator's
    fast-mode default since round 4, now applied to this kernel's walks
    too (round-4 verdict missing #2). Same self-consistency: the grads
    are the exact gradients of the corner-culled render, and a culled
    pair contributes exactly zero gradient.
    """
    from . import fitness
    from .render_pallas import _MAX_SMEM_SPLATS

    B, N = int(g_axes.shape[0]), int(g_axes.shape[1])
    if N > _MAX_SMEM_SPLATS:
        raise ValueError(
            f"fused_value_and_grad requires N <= {_MAX_SMEM_SPLATS} (got {N}); "
            "use the unfused loss (render_pallas_diff chains SMEM chunks)"
        )
    cap = N if bin_capacity is None else min(bin_capacity, N)
    if tile_h is None:
        budget = 10 * 1024 * 1024
        mc = _cdiv(cap, _CHUNK)
        tile_h = 8
        for th in (64, 32, 16):
            scratch = th * tile_w * 4 * ((mc + 1) * 3 + 3 * _CHUNK + _CHUNK)
            if scratch <= budget:
                tile_h = th
                break
    bgt = tuple(float(c) for c in background)

    w_eff, denom = fitness.weff_denom(weight_mask, boost_only, boost_beta, H, W)

    def chain(g_ax):
        g9 = codec.genome_to_renderer(g_ax)
        g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)
        p = codec.preprocess(g9, H, W, k_sigma)
        if cull_eps is not None:
            p = _tighten_boxes(p, k_sigma, cull_eps)
        elif box == "tight":
            # exact-tight tier (DESIGN §8e): deterministic tight k-sigma
            # box, no ε/alpha term — the grads are the exact gradients OF
            # the tight-box render, all three walks share the boxes.
            p = codec.tighten_boxes_exact(p, k_sigma)
        return (
            p.cx, p.cy, p.sxx, p.sxy, p.syy, p.rc, p.gc, p.bc, p.a,
            p.x0.astype(jnp.float32), p.x1.astype(jnp.float32),
            p.y0.astype(jnp.float32), p.y1.astype(jnp.float32),
        )

    arrs, pull = jax.vjp(chain, g_axes)
    corner_eps = float(cull_eps) if (corner_cull and cull_eps is not None) else None
    run = _make_screen_lossgrad(
        B, N, H, W, tile_h, tile_w, cap, bgt, interpret, corner_eps=corner_eps
    )
    # scale: d(mean_b fits_b)/d(num_b) * d(num)/d(img) inner factor —
    # fits = num / denom, loss = mean(fits) => dL/dimg = (2/(B*denom)) w diff
    num, g = run(arrs, target, w_eff, 2.0 / (B * denom))
    fits = num / denom
    zero = jnp.zeros((B, N), jnp.float32)
    cots = tuple(g[:, i] for i in range(_NGRAD)) + (zero, zero, zero, zero)
    (grads,) = pull(cots)
    return (jnp.mean(fits), fits), grads


def render_pallas_diff(
    g9: jnp.ndarray,
    H: int,
    W: int,
    k_sigma: float = 3.0,
    background: Sequence[float] = (1.0, 1.0, 1.0),
    bin_capacity: Optional[int] = None,
    tile_h: Optional[int] = None,
    tile_w: int = 128,
    interpret: bool = False,
    y_origin: Optional[jnp.ndarray] = None,
    out_rows: Optional[int] = None,
    cull_eps: Optional[float] = None,
    corner_cull: bool = False,
    box: str = "reference",  # "reference" | "tight" (exact-tight tier)
) -> jnp.ndarray:
    """Differentiable Pallas render: [B, N, 9] (or [N, 9]) -> [B, H, W, 3].

    Forward is the exact Pallas rasterizer; backward is the analytic
    Pallas kernel above, chained through codec.preprocess by JAX VJP.
    Grads match the XLA oracle's autodiff (see tests/test_render_grad.py).

    tile_h=None picks the tallest tile whose backward remat scratch
    (chunk-boundary canvases + e-planes + prefix canvases) fits VMEM
    comfortably — taller tiles mean fewer (tile, splat) pairs and were
    measured ~2x faster for 2k splats at 512^2, but the boundary-canvas
    scratch grows with ceil(cap/32)*tile_h*tile_w.

    (y_origin, out_rows): render only `out_rows` canvas rows starting at
    global row y_origin — the tile-sharded building block: splats are
    preprocessed against the global (H, W) canvas then shifted (exact in
    f32, see render_pallas.fitness_pallas_partial), so a shard_map over
    row slabs plus a psum of the loss reproduces the full-canvas gradient
    with splat-grad all-reduce over the tile mesh axis (SURVEY.md §2.4).
    The shift is differentiable: d(cy - y0)/d(cy) = 1.

    cull_eps: opt-in fast-mode ε-cull of the AABBs before binning (same
    semantics and caveats as fused_value_and_grad — the result is the
    exact-gradient ε-culled render, and sub-ε-alpha splats get zero grad).
    Applied AFTER the y_origin shift, so the tight box intersects the
    shifted one (mirrors render_pallas.fitness_pallas_partial).
    corner_cull (needs cull_eps) adds the rect-min corner cull at binning
    — see fused_value_and_grad; also computed post-shift, so the test runs
    in slab coordinates exactly like the walk's tile rects.
    """
    squeeze = g9.ndim == 2
    if squeeze:
        g9 = g9[None]
    B, N, C = g9.shape
    g9 = g9[..., : codec.GENE_DIM].astype(jnp.float32)
    cap = N if bin_capacity is None else min(bin_capacity, N)
    if tile_h is None:
        budget = 10 * 1024 * 1024  # leave VMEM headroom for blocks/regs
        mc = _cdiv(cap, _CHUNK)
        tile_h = 8
        # With a row slab (out_rows), taller-than-slab tiles would render
        # (and backprop through) pure padding — restrict to its divisors.
        # (For a full canvas, padding is at most one tile row: keep the
        # tallest tile that fits the VMEM budget.)
        for th in (64, 32, 16):
            if out_rows is not None and (out_rows < th or out_rows % th != 0):
                continue
            scratch = th * tile_w * 4 * ((mc + 1) * 3 + 3 * _CHUNK + _CHUNK)
            if scratch <= budget:
                tile_h = th
                break

    p = codec.preprocess(g9, H, W, k_sigma)
    Hs = H if out_rows is None else out_rows
    if y_origin is not None:
        yo_i = y_origin.astype(p.y0.dtype)
        p = p._replace(
            cy=p.cy - y_origin.astype(jnp.float32),
            y0=p.y0 - yo_i,
            y1=p.y1 - yo_i,
        )
    if cull_eps is not None:
        p = _tighten_boxes(p, k_sigma, cull_eps)
    elif box == "tight":
        # Deterministic tight k-sigma box (the exact-tight tier, DESIGN
        # §8e): intersects the (already shifted) preprocess box, and the
        # integer y-shift commutes with floor/ceil — same inheritance
        # argument as the ε-cull above.
        p = codec.tighten_boxes_exact(p, k_sigma)
    bgt = tuple(float(c) for c in background)

    def arrs_of(pc):
        return (
            pc.cx, pc.cy, pc.sxx, pc.sxy, pc.syy, pc.rc, pc.gc, pc.bc, pc.a,
            pc.x0.astype(jnp.float32), pc.x1.astype(jnp.float32),
            pc.y0.astype(jnp.float32), pc.y1.astype(jnp.float32),
        )

    # Split splats into SMEM-sized chunks (see render_pallas._chunked_passes);
    # each pass is itself custom-VJP differentiable and passes its canvas —
    # and, backward, the g*T_total cotangent — to the next, so jax.grad
    # chains through arbitrarily many passes exactly.
    from .render_pallas import _MAX_SMEM_SPLATS, _split_screen

    corner_eps = float(cull_eps) if (corner_cull and cull_eps is not None) else None
    n_chunks = max(1, _cdiv(N, _MAX_SMEM_SPLATS))
    bounds = [i * N // n_chunks for i in range(n_chunks + 1)]
    img_p = None
    for i in range(n_chunks):
        pc = _split_screen(p, bounds[i], bounds[i + 1]) if n_chunks > 1 else p
        Nc = bounds[i + 1] - bounds[i]
        capc = min(cap, Nc)
        fn = _make_screen_render(
            B, Nc, Hs, W, tile_h, tile_w, capc, bgt, interpret,
            has_init=img_p is not None, corner_eps=corner_eps,
        )
        img_p = fn(*arrs_of(pc)) if img_p is None else fn(img_p, *arrs_of(pc))

    img = jnp.transpose(img_p[:, :, :Hs, :W], (0, 2, 3, 1))
    return img[0] if squeeze else img
