"""Pallas TPU kernel for RAPPIDS pyramid inflation.

The jnp inflation (planner/rappids.py:inflate_pyramid) is algorithmically
one bounded expansion loop plus ~30 whole-image masked reductions per seed;
vmapped over P seeds XLA materializes per-seed (H, W) intermediates in HBM
and re-reads the depth image for every reduction — O(30 * P * H * W) HBM
traffic dominates plan(). This kernel keeps the depth image (plus the
shared shrink-distance table) resident in VMEM and runs the *entire* inflation for one seed per grid step:

  grid = (P,); per program:
    1. initial-rectangle blockage check   (tiled masked any)
    2. max-sweep rectangle expansion      (bounded while_loop, two tiled
       half-passes per round; see rappids.inflate_pyramid)
    3. base depth over the expanded rect  (tiled masked min)
    4. edge-band shrink reductions        (tiled, 4 bands x 4 accumulators)
    5. corner-band shrink reductions      (tiled, 4 corners)

The image passes stream over TILE_H-row tiles with scalar accumulators so
live VMEM intermediates stay ~TILE_H x W instead of ~20 full images (a full
640x480 materialization of every mask blew the 16 MB VMEM budget).

Every pass loops only over the tiles its mask can actually hit, which is
bit-exact (a skipped tile contributes only identity elements to the masked
reductions): the rect passes (1-3 and the column half-sweep) cover rows
[t, b]; the row half-sweep's below/above searches run as early-exit
while_loops from the rect edge outward (the first tile containing a match
bounds the min/max — later tiles are strictly farther); the band/corner
passes split into top [0, t] / middle [t, b] / bottom [b, H-1] region
loops, each computing only the bands whose mask intersects that region
(corners skip the middle entirely). A seed whose initial rectangle is
blocked (or pre-gated not-ok) early-outs after pass 1 via trip-count
gating — every later tile loop collapses to zero iterations — so its
bounds are unspecified by contract (tests/test_pallas_inflate.py) and
both paths mask them via PyramidSet.valid. Typical pyramids span a
fraction of the image rows, so this cuts most of the ~8 full-image sweeps
the flat version paid per seed.

All arithmetic is integer and ordered exactly as the jnp path, so outputs
are bit-identical (tested in interpret mode and on-device). Semantics match
DepthImagePlanner.cpp:456-970 through the same conservative reformulation
documented in planner/rappids.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIXEL_BUFFER = 2  # must match rappids.PIXEL_BUFFER
BIG = 1 << 20


def _tile_h(H: int) -> int:
    """Largest divisor of H that is <= 64 and a multiple of 8 (sublane
    alignment); falls back to H for small images."""
    for t in range(64, 7, -8):
        if H % t == 0:
            return t
    return H


def _kernel(seed_ref, img_ref, shrink_ref, out_ref, *, W, H, TH):
    """One seed's full inflation. seed_ref row layout (int32):
    [x0, y0, min_pyr_depth, l0, r0, t0, b0, ok0, edge_off, ignore, 0, 0]."""
    p = pl.program_id(0)
    x0 = seed_ref[p, 0]
    y0 = seed_ref[p, 1]
    minpyr = seed_ref[p, 2]
    l0 = seed_ref[p, 3]
    r0 = seed_ref[p, 4]
    t0 = seed_ref[p, 5]
    b0 = seed_ref[p, 6]
    ok = seed_ref[p, 7] > 0
    edge_off = seed_ref[p, 8]
    ignore = seed_ref[p, 9]

    n_tiles = H // TH
    xs_t = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    ys_base = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
    big = jnp.int32(BIG)
    tbool = jnp.bool_(True)
    fbool = jnp.bool_(False)

    def tile(ti):
        img = img_ref[pl.ds(ti * TH, TH), :]
        return img, ys_base + ti * TH

    def row_tiles(ya, yb):
        """fori_loop bounds covering every tile intersecting rows
        [ya, yb]; exact for arbitrary (even garbage) values — clamped to
        the image, empty when yb < ya."""
        ta = jnp.clip(ya // TH, 0, n_tiles)
        tb = jnp.clip(yb // TH + 1, 0, n_tiles)
        return ta, jnp.maximum(ta, tb)

    # --- pass A: initial rect must be free (rows [t0, b0] only) ---
    def passA(ti, bad):
        img, ys = tile(ti)
        blocked = (img > ignore) & (img < minpyr)
        in_rect0 = (xs_t >= l0) & (xs_t <= r0) & (ys >= t0) & (ys <= b0)
        return bad | jnp.any(blocked & in_rect0)

    taA, tbA = row_tiles(t0, b0)
    ok = ok & ~jax.lax.fori_loop(taA, tbA, passA, fbool)

    # Blocked-seed early-out: every later pass gates its tile-loop trip
    # count on `ok` (empty fori ranges / a dead expansion while_loop), so
    # a blocked or pre-gated seed pays pass A only. Unlike a lax.cond
    # around the remaining passes (which duplicates the whole region and
    # stalls the Mosaic compiler), trip-count gating costs nothing to
    # compile. The skipped seed's bounds are loop-identity garbage —
    # unspecified by contract (tests/test_pallas_inflate.py); consumers
    # mask via PyramidSet.valid, and final `ok` stays False regardless.
    def gated(bounds):
        ta, tb = bounds
        return ta, jnp.where(ok, tb, ta)

    # --- max-sweep expansion (same rounds as the jnp path; see
    # rappids.inflate_pyramid). Two tiled half-passes per round: columns
    # within [t, b], then rows within the updated [l2, r2]. ---
    EXPAND_ROUNDS = 8

    def cond(st):
        l, r, t, b, rounds, changed = st
        return changed & (rounds < EXPAND_ROUNDS)

    def body(st):
        l, r, t, b, rounds, _ = st

        def half1(ti, acc):
            first_r, last_l = acc
            img, ys = tile(ti)
            m = (img > ignore) & (img < minpyr) & (ys >= t) & (ys <= b)
            first_r = jnp.minimum(first_r, jnp.min(jnp.where(m & (xs_t > r), xs_t, big)))
            last_l = jnp.maximum(last_l, jnp.max(jnp.where(m & (xs_t < l), xs_t, -big)))
            return first_r, last_l

        ta1, tb1 = row_tiles(t, b)
        first_r, last_l = jax.lax.fori_loop(ta1, tb1, half1, (big, -big))
        r2 = jnp.maximum(r, jnp.minimum(first_r - 1, W - 1 - edge_off))
        l2 = jnp.minimum(l, jnp.maximum(last_l + 1, edge_off))

        # row half-sweep: the below/above searches scan outward from the
        # rect edge and stop at the first tile containing a match (every
        # later tile is strictly farther, so the min/max is already final)
        def bot_cond(st2):
            ti, first_b = st2
            return (ti < n_tiles) & (first_b == big)

        def bot_body(st2):
            ti, first_b = st2
            img, ys = tile(ti)
            m = ((img > ignore) & (img < minpyr)
                 & (xs_t >= l2) & (xs_t <= r2) & (ys > b))
            return ti + 1, jnp.minimum(first_b, jnp.min(jnp.where(m, ys, big)))

        _, first_b = jax.lax.while_loop(
            bot_cond, bot_body, (jnp.maximum((b + 1) // TH, 0), big))

        def top_cond(st2):
            ti, last_t = st2
            return (ti >= 0) & (last_t == -big)

        def top_body(st2):
            ti, last_t = st2
            img, ys = tile(ti)
            m = ((img > ignore) & (img < minpyr)
                 & (xs_t >= l2) & (xs_t <= r2) & (ys < t))
            return ti - 1, jnp.maximum(last_t, jnp.max(jnp.where(m, ys, -big)))

        _, last_t = jax.lax.while_loop(
            top_cond, top_body, (jnp.minimum((t - 1) // TH, n_tiles - 1), -big))

        b2 = jnp.maximum(b, jnp.minimum(first_b - 1, H - 1 - edge_off))
        t2 = jnp.minimum(t, jnp.maximum(last_t + 1, edge_off))
        ch = (l2 != l) | (r2 != r) | (t2 != t) | (b2 != b)
        return (l2, r2, t2, b2, rounds + 1, ch)

    l, r, t, b, *_ = jax.lax.while_loop(
        cond, body, (l0, r0, t0, b0, jnp.int32(0), ok)
    )

    # --- pass B: base depth = min unmasked depth inside the expanded rect ---
    def passB(ti, cur):
        img, ys = tile(ti)
        in_rect = (xs_t >= l) & (xs_t <= r) & (ys >= t) & (ys <= b)
        masked = jnp.where((img > ignore) & in_rect, img, big)
        return jnp.minimum(cur, jnp.min(masked))

    taB, tbB = gated(row_tiles(t, b))
    maxd = jnp.minimum(jax.lax.fori_loop(taB, tbB, passB, big), jnp.int32(65535))

    # --- pass C: edge-band shrink reductions ---
    r_init = W - 1 - edge_off
    l_init = edge_off
    t_init = edge_off
    b_init = H - 1 - edge_off

    def band_tile(band, primary, alt_hi, alt_lo, seed_main, seed_alt, is_min):
        """Per-tile band logic; returns (edge, hi, lo, fail) partials."""
        if is_min:
            can_primary = seed_main < primary - PIXEL_BUFFER
        else:
            can_primary = seed_main > primary + PIXEL_BUFFER
        can_hi = seed_alt > alt_hi + PIXEL_BUFFER
        can_lo = seed_alt < alt_lo - PIXEL_BUFFER
        fail = band & ~can_primary & ~can_hi & ~can_lo
        use_hi = band & ~can_primary & can_hi & ~can_lo
        use_lo = band & ~can_primary & can_lo & ~can_hi
        both = band & ~can_primary & can_hi & can_lo
        hi_loss = alt_hi - t_init
        lo_loss = b_init - alt_lo
        use_hi = use_hi | (both & (lo_loss > hi_loss))
        use_lo = use_lo | (both & ~(lo_loss > hi_loss))
        use_primary = band & can_primary
        if is_min:
            edge = jnp.min(jnp.where(use_primary, primary, big))
        else:
            edge = jnp.max(jnp.where(use_primary, primary, -big))
        hi_val = jnp.max(jnp.where(use_hi, alt_hi, -big))
        lo_val = jnp.min(jnp.where(use_lo, alt_lo, big))
        return edge, hi_val, lo_val, jnp.any(fail)

    def shrink_tile(ti):
        img, ys = tile(ti)
        relevant = (img > ignore) & (img < maxd)
        shrink = shrink_ref[pl.ds(ti * TH, TH), :]
        return relevant, ys, xs_t - shrink, xs_t + shrink, ys + shrink, ys - shrink

    # middle region (rows [t, b]): left/right bands only
    def passC_mid(ti, acc):
        re_, rhi, rlo, rfl, le_, lhi, llo, lfl = acc
        relevant, ys, s_right, s_left, s_top, s_bottom = shrink_tile(ti)
        ys_in = (ys >= t) & (ys <= b)

        e, h, lo, f = band_tile(relevant & (xs_t >= r) & ys_in,
                                s_right, s_top, s_bottom, x0, y0, True)
        re_, rhi, rlo, rfl = (jnp.minimum(re_, e), jnp.maximum(rhi, h),
                              jnp.minimum(rlo, lo), rfl | f)
        e, h, lo, f = band_tile(relevant & (xs_t <= l) & ys_in,
                                s_left, s_top, s_bottom, x0, y0, False)
        le_, lhi, llo, lfl = (jnp.maximum(le_, e), jnp.maximum(lhi, h),
                              jnp.minimum(llo, lo), lfl | f)
        return re_, rhi, rlo, rfl, le_, lhi, llo, lfl

    # top region (rows [0, t]): top band only
    def passC_top(ti, acc):
        te_, thi, tlo, tfl = acc
        relevant, ys, s_right, s_left, s_top, s_bottom = shrink_tile(ti)
        xs_in = (xs_t >= l) & (xs_t <= r)
        e, h, lo, f = band_tile(relevant & (ys <= t) & xs_in,
                                s_top, s_left, s_right, y0, x0, False)
        return (jnp.maximum(te_, e), jnp.maximum(thi, h),
                jnp.minimum(tlo, lo), tfl | f)

    # bottom region (rows [b, H-1]): bottom band only
    def passC_bot(ti, acc):
        be_, bhi, blo, bfl = acc
        relevant, ys, s_right, s_left, s_top, s_bottom = shrink_tile(ti)
        xs_in = (xs_t >= l) & (xs_t <= r)
        e, h, lo, f = band_tile(relevant & (ys >= b) & xs_in,
                                s_bottom, s_left, s_right, y0, x0, True)
        return (jnp.minimum(be_, e), jnp.maximum(bhi, h),
                jnp.minimum(blo, lo), bfl | f)

    taM, tbM = gated(row_tiles(t, b))
    right_e, rt_hi, rt_lo, f1, left_e, lt_hi, lt_lo, f2 = jax.lax.fori_loop(
        taM, tbM, passC_mid,
        (big, -big, big, fbool, -big, -big, big, fbool))
    taT, tbT = gated(row_tiles(jnp.int32(0), t))
    top_e, tp_hi, tp_lo, f3 = jax.lax.fori_loop(
        taT, tbT, passC_top, (-big, -big, big, fbool))
    taB2, tbB2 = gated(row_tiles(b, jnp.int32(H - 1)))
    bot_e, bt_hi, bt_lo, f4 = jax.lax.fori_loop(
        taB2, tbB2, passC_bot, (big, -big, big, fbool))
    right_e = jnp.minimum(right_e, r_init)
    left_e = jnp.maximum(left_e, l_init)
    top_e = jnp.maximum(top_e, t_init)
    bot_e = jnp.minimum(bot_e, b_init)
    ok = ok & ~(f1 | f2 | f3 | f4)

    right_f = jnp.minimum(right_e, jnp.minimum(tp_lo, bt_lo))
    left_f = jnp.maximum(left_e, jnp.maximum(tp_hi, bt_hi))
    top_f = jnp.maximum(top_e, jnp.maximum(rt_hi, lt_hi))
    bottom_f = jnp.minimum(bot_e, jnp.minimum(rt_lo, lt_lo))

    # --- pass D: corner-band shrink reductions ---
    h_span = jnp.maximum(bottom_f - top_f, 1)
    w_span = jnp.maximum(right_f - left_f, 1)

    def corner_tile(band, s_a, a_is_min, a_seed_ok, s_b, b_is_min, b_seed_ok,
                    a_loss, b_loss):
        both_bad = band & ~a_seed_ok & ~b_seed_ok
        use_a = band & a_seed_ok & (~b_seed_ok | (b_loss > a_loss))
        use_b = band & b_seed_ok & ~use_a
        a_val = jnp.where(use_a, s_a, big if a_is_min else -big)
        a_val = jnp.min(a_val) if a_is_min else jnp.max(a_val)
        b_val = jnp.where(use_b, s_b, big if b_is_min else -big)
        b_val = jnp.min(b_val) if b_is_min else jnp.max(b_val)
        return a_val, b_val, jnp.any(both_bad)

    # top region (rows [0, t]): top-right + top-left corners
    def passD_top(ti, acc):
        tr_r, tr_t, tr_f, tl_l, tl_t, tl_f = acc
        relevant, ys, s_right, s_left, s_top, s_bottom = shrink_tile(ti)

        # top-right: right (min) & top (max)
        band = relevant & (xs_t >= r) & (ys <= t) & (s_right < right_f) & (s_top > top_f)
        a, bv, f = corner_tile(
            band, s_right, True, x0 < s_right - PIXEL_BUFFER,
            s_top, False, y0 > s_top + PIXEL_BUFFER,
            (right_f - s_right) * h_span, (s_top - top_f) * w_span)
        tr_r, tr_t, tr_f = jnp.minimum(tr_r, a), jnp.maximum(tr_t, bv), tr_f | f

        # top-left: left (max) & top (max)
        band = relevant & (xs_t <= l) & (ys <= t) & (s_left > left_f) & (s_top > top_f)
        a, bv, f = corner_tile(
            band, s_left, False, x0 > s_left + PIXEL_BUFFER,
            s_top, False, y0 > s_top + PIXEL_BUFFER,
            (s_left - left_f) * h_span, (s_top - top_f) * w_span)
        tl_l, tl_t, tl_f = jnp.maximum(tl_l, a), jnp.maximum(tl_t, bv), tl_f | f

        return tr_r, tr_t, tr_f, tl_l, tl_t, tl_f

    # bottom region (rows [b, H-1]): bottom-right + bottom-left corners
    def passD_bot(ti, acc):
        br_r, br_b, br_f, bl_l, bl_b, bl_f = acc
        relevant, ys, s_right, s_left, s_top, s_bottom = shrink_tile(ti)

        # bottom-right: right (min) & bottom (min)
        band = relevant & (xs_t >= r) & (ys >= b) & (s_right < right_f) & (s_bottom < bottom_f)
        a, bv, f = corner_tile(
            band, s_right, True, x0 < s_right - PIXEL_BUFFER,
            s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
            (right_f - s_right) * h_span, (bottom_f - s_bottom) * w_span)
        br_r, br_b, br_f = jnp.minimum(br_r, a), jnp.minimum(br_b, bv), br_f | f

        # bottom-left: left (max) & bottom (min)
        band = relevant & (xs_t <= l) & (ys >= b) & (s_left > left_f) & (s_bottom < bottom_f)
        a, bv, f = corner_tile(
            band, s_left, False, x0 > s_left + PIXEL_BUFFER,
            s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
            (s_left - left_f) * h_span, (bottom_f - s_bottom) * w_span)
        bl_l, bl_b, bl_f = jnp.maximum(bl_l, a), jnp.minimum(bl_b, bv), bl_f | f

        return br_r, br_b, br_f, bl_l, bl_b, bl_f

    tr_r, tr_t, tr_f, tl_l, tl_t, tl_f = jax.lax.fori_loop(
        taT, tbT, passD_top, (big, -big, fbool, -big, -big, fbool))
    br_r, br_b, br_f, bl_l, bl_b, bl_f = jax.lax.fori_loop(
        taB2, tbB2, passD_bot, (big, big, fbool, -big, big, fbool))

    right_f = jnp.minimum(right_f, jnp.minimum(tr_r, br_r))
    top_f = jnp.maximum(top_f, jnp.maximum(tr_t, tl_t))
    left_f = jnp.maximum(left_f, jnp.maximum(tl_l, bl_l))
    bottom_f = jnp.minimum(bottom_f, jnp.minimum(br_b, bl_b))
    ok = ok & ~(tr_f | br_f | tl_f | bl_f)

    # final validity
    ok = ok & (left_f + PIXEL_BUFFER < right_f - PIXEL_BUFFER)
    ok = ok & (top_f + PIXEL_BUFFER < bottom_f - PIXEL_BUFFER)
    ok = ok & (x0 > left_f + PIXEL_BUFFER) & (x0 < right_f - PIXEL_BUFFER)
    ok = ok & (y0 > top_f + PIXEL_BUFFER) & (y0 < bottom_f - PIXEL_BUFFER)

    row = jnp.stack(
        [ok.astype(jnp.int32), maxd, right_f, top_f, left_f, bottom_f,
         jnp.int32(0), jnp.int32(0)]
    ).reshape(1, 8)
    out_ref[pl.ds(p, 1), :] = row


def inflate_pyramids(params, depth_u16, x0s, y0s, min_depths,
                     shrink_extra: int = 0, interpret: bool = False,
                     tile_h: int | None = None):
    """Batched pyramid inflation on TPU. Same contract as
    jax.vmap(rappids.inflate_pyramid) restricted to its integer stage:
    returns (ok (P,) bool, maxd (P,) int32 expanded-rect min depth,
    edges (P, 4) int32 [right, top, left, bottom]).

    The prologue (seed validity, initial rectangle) is computed in jnp with
    the exact expressions of rappids.inflate_pyramid so results stay
    bit-identical across the two paths.
    """
    cam = params.cam
    W, H = int(cam.width), int(cam.height)
    scale = cam.depth_scale
    img = depth_u16.astype(jnp.int32)
    P = x0s.shape[0]

    x0i = jnp.asarray(x0s, jnp.int32)
    y0i = jnp.asarray(y0s, jnp.int32)

    edge_off = (cam.focal * params.true_radius / params.min_check_dist).astype(jnp.int32) + shrink_extra
    ok0 = ~(
        (x0i <= edge_off + PIXEL_BUFFER + 1)
        | (x0i > W - edge_off - PIXEL_BUFFER - 1)
        | (y0i <= edge_off + PIXEL_BUFFER + 1)
        | (y0i > H - edge_off - PIXEL_BUFFER - 1)
    )
    min_pyr_depth = ((jnp.asarray(min_depths, jnp.float32) + params.plan_radius) / scale).astype(jnp.int32)
    init_radius = (cam.focal * params.plan_radius / (scale * min_pyr_depth.astype(jnp.float32))).astype(jnp.int32)
    ok0 = ok0 & (2 * init_radius < jnp.minimum(W, H) - 2 * edge_off)
    ignore = (params.true_radius / scale).astype(jnp.int32)

    top0 = jnp.where(y0i - init_radius < edge_off, edge_off,
                     jnp.minimum(H - edge_off - 1, y0i + init_radius) - 2 * init_radius)
    bottom0 = top0 + 2 * init_radius
    left0 = jnp.where(x0i - init_radius < edge_off, edge_off,
                      jnp.minimum(W - edge_off - 1, x0i + init_radius) - 2 * init_radius)
    right0 = left0 + 2 * init_radius

    numer = (cam.focal * params.plan_radius / scale).astype(jnp.int32)
    shrink_px = numer // jnp.maximum(img, 1) + shrink_extra

    bcast = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.int32), (P,))
    seeds = jnp.stack(
        [x0i, y0i, min_pyr_depth, left0, right0, top0, bottom0,
         ok0.astype(jnp.int32), bcast(edge_off), bcast(ignore),
         jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32)],
        axis=1,
    )  # (P, 12)

    TH = _tile_h(H) if tile_h is None else int(tile_h)
    if H % TH != 0 or TH % 8 != 0:
        raise ValueError(f"tile_h={TH} must divide H={H} and be a multiple of 8")
    kernel = functools.partial(_kernel, W=W, H=H, TH=TH)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((H, W), lambda p, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, W), lambda p, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((P, 8), lambda p, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seeds, img, shrink_px)

    ok = out[:, 0] > 0
    maxd = out[:, 1]
    edges = out[:, 2:6]  # [right, top, left, bottom]
    return ok, maxd, edges
