"""Pallas TPU kernel for RAPPIDS pyramid inflation.

The jnp inflation (planner/rappids.py:inflate_pyramid) is algorithmically
one bounded expansion loop plus ~30 whole-image masked reductions per seed;
vmapped over P seeds XLA materializes per-seed (H, W) intermediates in HBM
and re-reads the depth image for every reduction — O(30 * P * H * W) HBM
traffic dominates plan(). This kernel keeps the depth image (plus the
shared shrink-distance table) resident in VMEM and runs the *entire* inflation for one seed per grid step:

  grid = (P,); per program:
    1. initial-rectangle blockage check   (tiled masked any)
    2. max-sweep rectangle expansion      (bounded while_loop, early-exit
       outward searches; see rappids.inflate_pyramid)
    3. base depth over the expanded rect  (tiled masked min)
    4. edge-band shrink reductions        (tiled, 4 bands x 4 accumulators)
    5. corner-band shrink reductions      (tiled, 4 corners)

The image passes stream over (TILE_H, TILE_W) tiles with scalar
accumulators so live VMEM intermediates stay tiny (a full 640x480
materialization of every mask blew the 16 MB VMEM budget). The image and
shrink table are pre-laid-out column-tile-major — (n_col_tiles * H,
TILE_W) with TILE_W = one 128-lane vreg row — so a (ti, tj) tile is a
dynamic SUBLANE slice (lane-dim dynamic starts don't lower in Mosaic).

Every pass loops only over the tiles its mask can actually hit, in BOTH
dimensions, which is bit-exact (a skipped tile contributes only identity
elements to the masked reductions): rect passes (1, 3) cover rows [t, b]
x cols [l, r]; the expansion's four searches run as early-exit while
sweeps outward from the rect edge (the first tile line containing a match
bounds the min/max — later lines are strictly farther); the edge-band
passes cover only their band's region (left/right bands span cols
[0, l] / [r, W-1] of rows [t, b] — the rect interior is in no band);
the corner passes cover only their quadrant. A seed whose initial
rectangle is blocked (or pre-gated not-ok) early-outs after pass 1 via
trip-count gating — every later tile loop collapses to zero iterations —
so its bounds are unspecified by contract (tests/test_pallas_inflate.py)
and both paths mask them via PyramidSet.valid. Typical pyramids span a
fraction of the image in both axes, so this cuts most of the ~8
full-image sweeps the flat version paid per seed.

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

# Seeds co-resident per grid program (None arg -> this). S>1 batches the
# C/D band sweeps across a seed group — bit-identical outputs. Measured
# on-device (v5e, 640x480): 2.2x on clustered all-valid seed batches
# (32 candidate endpoints: S=1 5.42 -> S=8 2.43 us/seed) but a LOSS at
# real plan() shapes (S=1/2/4/8 lazy full-res 0.83/0.95/1.16/1.41 ms) —
# production seed sets are spatially diverse and mostly prefiltered-dead,
# and the grouped sweep pays S x per-tile band math on the union of live
# regions while S=1's dead seeds early-out after pass A. Stays 1 for
# production; see BENCH_DETAILS "inflation".
DEFAULT_SEEDS_PER_PROGRAM = 1


def _tile_h(H: int) -> int:
    """Largest divisor of H that is <= 64 and a multiple of 8 (sublane
    alignment); falls back to H for small images."""
    for t in range(64, 7, -8):
        if H % t == 0:
            return t
    return H


def _tile_w(W: int) -> int:
    """Largest divisor of W that is <= 128 (one vreg of lanes); small test
    images (W 80/160) only run in interpret mode where lane width is moot."""
    for t in range(128, 0, -1):
        if W % t == 0:
            return t
    return W


def _kernel(seed_ref, tables_ref, img_ref, shrink_ref, out_ref, *, W, H,
            TH, TW, skip=frozenset()):
    """One seed's full inflation. seed_ref row layout (int32):
    [x0, y0, min_pyr_depth, l0, r0, t0, b0, ok0, edge_off, ignore, 0, 0].
    img_ref/shrink_ref are column-tile-major: (n_tj * H, TW), tile (ti,
    tj) at rows [tj * H + ti * TH, +TH).

    tables_ref (5, n_ti, n_tj) int32 holds per-tile aggregates over the
    valid (img > ignore) pixels, shared across all seeds (see
    _tile_tables): [0] min img, [1] min xs - shrink, [2] max xs + shrink,
    [3] max ys + shrink, [4] min ys - shrink. They gate per-tile
    lax.conds that skip tiles which provably contribute only identity
    elements to a pass's masked reductions (~80% of pass C/D tile visits
    on cluttered scenes), and let pass B read a fully-interior tile's min
    depth straight from the table — all bit-exact by construction."""
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

    n_ti = H // TH
    n_tj = W // TW
    xs_base = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
    ys_base = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    big = jnp.int32(BIG)
    fbool = jnp.bool_(False)

    def tile(ti, tj):
        img = img_ref[pl.ds(tj * H + ti * TH, TH), :]
        return img, ys_base + ti * TH, xs_base + tj * TW

    def skipping(pred_of, body):
        """Skip tiles whose predicate holds; the predicate must imply the
        tile contributes only identity elements to the masked reductions,
        so outputs are bit-identical with or without the skip."""
        def wrapped(ti, tj, acc):
            return jax.lax.cond(
                pred_of(ti, tj), lambda a: a, lambda a: body(ti, tj, a), acc)
        return wrapped

    def no_blocker(ti, tj):  # no px with ignore < img < minpyr in tile
        return tables_ref[0, ti, tj] >= minpyr

    def no_relevant(ti, tj):  # no px with ignore < img < maxd in tile
        return tables_ref[0, ti, tj] >= maxd

    def row_tiles(ya, yb):
        """fori_loop bounds covering every row tile intersecting rows
        [ya, yb]; exact for arbitrary (even garbage) values — clamped to
        the image, empty when yb < ya."""
        ta = jnp.clip(ya // TH, 0, n_ti)
        tb = jnp.clip(yb // TH + 1, 0, n_ti)
        return ta, jnp.maximum(ta, tb)

    def col_tiles(xa, xb):
        ta = jnp.clip(xa // TW, 0, n_tj)
        tb = jnp.clip(xb // TW + 1, 0, n_tj)
        return ta, jnp.maximum(ta, tb)

    def region(ya, yb, xa, xb, body, init):
        """Nested fori over every (ti, tj) tile intersecting rows [ya, yb]
        x cols [xa, xb]; body(ti, tj, acc) -> acc."""
        ra, rb = row_tiles(ya, yb)
        ca, cb = col_tiles(xa, xb)

        def rows(ti, acc):
            return jax.lax.fori_loop(
                ca, cb, lambda tj, a: body(ti, tj, a), acc)

        return jax.lax.fori_loop(ra, rb, rows, init)

    # --- pass A: initial rect must be free (rows [t0, b0] x cols [l0, r0]) ---
    def passA(ti, tj, bad):
        img, ys, xs = tile(ti, tj)
        blocked = (img > ignore) & (img < minpyr)
        in_rect0 = (xs >= l0) & (xs <= r0) & (ys >= t0) & (ys <= b0)
        return bad | jnp.any(blocked & in_rect0)

    ok = ok & ~region(t0, b0, l0, r0, skipping(no_blocker, passA), fbool)

    # Blocked-seed early-out: every later pass gates its row-tile trip
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

    def gregion(ya, yb, xa, xb, body, init):
        ra, rb = gated(row_tiles(ya, yb))
        ca, cb = col_tiles(xa, xb)

        def rows(ti, acc):
            return jax.lax.fori_loop(
                ca, cb, lambda tj, a: body(ti, tj, a), acc)

        return jax.lax.fori_loop(ra, rb, rows, init)

    # --- max-sweep expansion (same rounds as the jnp path; see
    # rappids.inflate_pyramid). Four early-exit searches per round: the
    # first blocked column right of r / left of l within rows [t, b],
    # then the first blocked row below b / above t within the updated
    # [l2, r2]. Outward sweeps stop at the first tile line containing a
    # match (every later line is strictly farther). ---
    EXPAND_ROUNDS = 8

    def cond(st):
        l, r, t, b, rounds, changed = st
        return changed & (rounds < EXPAND_ROUNDS)

    def body(st):
        l, r, t, b, rounds, _ = st
        ra, rb = row_tiles(t, b)

        def col_line(tj, xmask_of):
            """Masked min/max of xs over col-tile tj, rows [t, b]."""
            def compute(ti, acc):
                mn, mx = acc
                img, ys, xs = tile(ti, tj)
                m = ((img > ignore) & (img < minpyr)
                     & (ys >= t) & (ys <= b) & xmask_of(xs))
                mn = jnp.minimum(mn, jnp.min(jnp.where(m, xs, big)))
                mx = jnp.maximum(mx, jnp.max(jnp.where(m, xs, -big)))
                return mn, mx

            def one(ti, acc):
                return jax.lax.cond(no_blocker(ti, tj), lambda a: a,
                                    lambda a: compute(ti, a), acc)
            return jax.lax.fori_loop(ra, rb, one, (big, -big))

        def right_cond(st2):
            tj, first_r = st2
            return (tj < n_tj) & (first_r == big)

        def right_body(st2):
            tj, first_r = st2
            mn, _ = col_line(tj, lambda xs: xs > r)
            return tj + 1, jnp.minimum(first_r, mn)

        _, first_r = jax.lax.while_loop(
            right_cond, right_body, (jnp.maximum((r + 1) // TW, 0), big))

        def left_cond(st2):
            tj, last_l = st2
            return (tj >= 0) & (last_l == -big)

        def left_body(st2):
            tj, last_l = st2
            _, mx = col_line(tj, lambda xs: xs < l)
            return tj - 1, jnp.maximum(last_l, mx)

        _, last_l = jax.lax.while_loop(
            left_cond, left_body, (jnp.minimum((l - 1) // TW, n_tj - 1), -big))

        r2 = jnp.maximum(r, jnp.minimum(first_r - 1, W - 1 - edge_off))
        l2 = jnp.minimum(l, jnp.maximum(last_l + 1, edge_off))

        ca2, cb2 = col_tiles(l2, r2)

        def row_line(ti, ymask_of):
            """Masked min/max of ys over row-tile ti, cols [l2, r2]."""
            def compute(tj, acc):
                mn, mx = acc
                img, ys, xs = tile(ti, tj)
                m = ((img > ignore) & (img < minpyr)
                     & (xs >= l2) & (xs <= r2) & ymask_of(ys))
                mn = jnp.minimum(mn, jnp.min(jnp.where(m, ys, big)))
                mx = jnp.maximum(mx, jnp.max(jnp.where(m, ys, -big)))
                return mn, mx

            def one(tj, acc):
                return jax.lax.cond(no_blocker(ti, tj), lambda a: a,
                                    lambda a: compute(tj, a), acc)
            return jax.lax.fori_loop(ca2, cb2, one, (big, -big))

        def bot_cond(st2):
            ti, first_b = st2
            return (ti < n_ti) & (first_b == big)

        def bot_body(st2):
            ti, first_b = st2
            mn, _ = row_line(ti, lambda ys: ys > b)
            return ti + 1, jnp.minimum(first_b, mn)

        _, first_b = jax.lax.while_loop(
            bot_cond, bot_body, (jnp.maximum((b + 1) // TH, 0), big))

        def top_cond(st2):
            ti, last_t = st2
            return (ti >= 0) & (last_t == -big)

        def top_body(st2):
            ti, last_t = st2
            _, mx = row_line(ti, lambda ys: ys < t)
            return ti - 1, jnp.maximum(last_t, mx)

        _, last_t = jax.lax.while_loop(
            top_cond, top_body, (jnp.minimum((t - 1) // TH, n_ti - 1), -big))

        b2 = jnp.maximum(b, jnp.minimum(first_b - 1, H - 1 - edge_off))
        t2 = jnp.minimum(t, jnp.maximum(last_t + 1, edge_off))
        ch = (l2 != l) | (r2 != r) | (t2 != t) | (b2 != b)
        return (l2, r2, t2, b2, rounds + 1, ch)

    if "expand" in skip:  # profiling knob: outputs are garbage when gated
        l, r, t, b = l0, r0, t0, b0
    else:
        l, r, t, b, *_ = jax.lax.while_loop(
            cond, body, (l0, r0, t0, b0, jnp.int32(0), ok)
        )

    # --- pass B: base depth = min unmasked depth inside the expanded rect.
    # A tile fully inside [t, b] x [l, r] contributes exactly its table
    # min (same mask, same fill) — a scalar read instead of a tile sweep.
    def passB(ti, tj, cur):
        row_lo = ti * TH
        col_lo = tj * TW
        interior = ((row_lo >= t) & (row_lo + (TH - 1) <= b)
                    & (col_lo >= l) & (col_lo + (TW - 1) <= r))

        def fast(c):
            return jnp.minimum(c, tables_ref[0, ti, tj])

        def slow(c):
            img, ys, xs = tile(ti, tj)
            in_rect = (xs >= l) & (xs <= r) & (ys >= t) & (ys <= b)
            masked = jnp.where((img > ignore) & in_rect, img, big)
            return jnp.minimum(c, jnp.min(masked))

        return jax.lax.cond(interior, fast, slow, cur)

    if "B" in skip:
        maxd = jnp.int32(65535)
    else:
        maxd = jnp.minimum(gregion(t, b, l, r, passB, big), jnp.int32(65535))

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

    def shrink_tile(ti, tj):
        img, ys, xs = tile(ti, tj)
        relevant = (img > ignore) & (img < maxd)
        shrink = shrink_ref[pl.ds(tj * H + ti * TH, TH), :]
        return relevant, ys, xs, xs - shrink, xs + shrink, ys + shrink, ys - shrink

    # right band: rows [t, b] x cols [r, W-1]
    def passC_right(ti, tj, acc):
        re_, rhi, rlo, rfl = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = relevant & (xs >= r) & (ys >= t) & (ys <= b)
        e, h, lo, f = band_tile(band, s_right, s_top, s_bottom, x0, y0, True)
        return (jnp.minimum(re_, e), jnp.maximum(rhi, h),
                jnp.minimum(rlo, lo), rfl | f)

    # left band: rows [t, b] x cols [0, l]
    def passC_left(ti, tj, acc):
        le_, lhi, llo, lfl = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = relevant & (xs <= l) & (ys >= t) & (ys <= b)
        e, h, lo, f = band_tile(band, s_left, s_top, s_bottom, x0, y0, False)
        return (jnp.maximum(le_, e), jnp.maximum(lhi, h),
                jnp.minimum(llo, lo), lfl | f)

    # top band: rows [0, t] x cols [l, r]
    def passC_top(ti, tj, acc):
        te_, thi, tlo, tfl = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = relevant & (ys <= t) & (xs >= l) & (xs <= r)
        e, h, lo, f = band_tile(band, s_top, s_left, s_right, y0, x0, False)
        return (jnp.maximum(te_, e), jnp.maximum(thi, h),
                jnp.minimum(tlo, lo), tfl | f)

    # bottom band: rows [b, H-1] x cols [l, r]
    def passC_bot(ti, tj, acc):
        be_, bhi, blo, bfl = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = relevant & (ys >= b) & (xs >= l) & (xs <= r)
        e, h, lo, f = band_tile(band, s_bottom, s_left, s_right, y0, x0, True)
        return (jnp.minimum(be_, e), jnp.maximum(bhi, h),
                jnp.minimum(blo, lo), bfl | f)

    if "C" in skip:
        right_e, rt_hi, rt_lo, f1 = big, -big, big, fbool
        left_e, lt_hi, lt_lo, f2 = -big, -big, big, fbool
        top_e, tp_hi, tp_lo, f3 = -big, -big, big, fbool
        bot_e, bt_hi, bt_lo, f4 = big, -big, big, fbool
    else:
        right_e, rt_hi, rt_lo, f1 = gregion(
            t, b, r, jnp.int32(W - 1), skipping(no_relevant, passC_right),
            (big, -big, big, fbool))
        left_e, lt_hi, lt_lo, f2 = gregion(
            t, b, jnp.int32(0), l, skipping(no_relevant, passC_left),
            (-big, -big, big, fbool))
        top_e, tp_hi, tp_lo, f3 = gregion(
            jnp.int32(0), t, l, r, skipping(no_relevant, passC_top),
            (-big, -big, big, fbool))
        bot_e, bt_hi, bt_lo, f4 = gregion(
            b, jnp.int32(H - 1), l, r, skipping(no_relevant, passC_bot),
            (big, -big, big, fbool))
    right_e = jnp.minimum(right_e, r_init)
    left_e = jnp.maximum(left_e, l_init)
    top_e = jnp.maximum(top_e, t_init)
    bot_e = jnp.minimum(bot_e, b_init)
    ok = ok & ~(f1 | f2 | f3 | f4)

    right_f = jnp.minimum(right_e, jnp.minimum(tp_lo, bt_lo))
    left_f = jnp.maximum(left_e, jnp.maximum(tp_hi, bt_hi))
    top_f = jnp.maximum(top_e, jnp.maximum(rt_hi, lt_hi))
    bottom_f = jnp.minimum(bot_e, jnp.minimum(rt_lo, lt_lo))

    # --- pass D: corner-band shrink reductions (one quadrant each) ---
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

    # top-right: rows [0, t] x cols [r, W-1]; right (min) & top (max)
    def passD_tr(ti, tj, acc):
        tr_r, tr_t, tr_f = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = (relevant & (xs >= r) & (ys <= t)
                & (s_right < right_f) & (s_top > top_f))
        a, bv, f = corner_tile(
            band, s_right, True, x0 < s_right - PIXEL_BUFFER,
            s_top, False, y0 > s_top + PIXEL_BUFFER,
            (right_f - s_right) * h_span, (s_top - top_f) * w_span)
        return jnp.minimum(tr_r, a), jnp.maximum(tr_t, bv), tr_f | f

    # top-left: rows [0, t] x cols [0, l]; left (max) & top (max)
    def passD_tl(ti, tj, acc):
        tl_l, tl_t, tl_f = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = (relevant & (xs <= l) & (ys <= t)
                & (s_left > left_f) & (s_top > top_f))
        a, bv, f = corner_tile(
            band, s_left, False, x0 > s_left + PIXEL_BUFFER,
            s_top, False, y0 > s_top + PIXEL_BUFFER,
            (s_left - left_f) * h_span, (s_top - top_f) * w_span)
        return jnp.maximum(tl_l, a), jnp.maximum(tl_t, bv), tl_f | f

    # bottom-right: rows [b, H-1] x cols [r, W-1]; right (min) & bottom (min)
    def passD_br(ti, tj, acc):
        br_r, br_b, br_f = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = (relevant & (xs >= r) & (ys >= b)
                & (s_right < right_f) & (s_bottom < bottom_f))
        a, bv, f = corner_tile(
            band, s_right, True, x0 < s_right - PIXEL_BUFFER,
            s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
            (right_f - s_right) * h_span, (bottom_f - s_bottom) * w_span)
        return jnp.minimum(br_r, a), jnp.minimum(br_b, bv), br_f | f

    # bottom-left: rows [b, H-1] x cols [0, l]; left (max) & bottom (min)
    def passD_bl(ti, tj, acc):
        bl_l, bl_b, bl_f = acc
        relevant, ys, xs, s_right, s_left, s_top, s_bottom = shrink_tile(ti, tj)
        band = (relevant & (xs <= l) & (ys >= b)
                & (s_left > left_f) & (s_bottom < bottom_f))
        a, bv, f = corner_tile(
            band, s_left, False, x0 > s_left + PIXEL_BUFFER,
            s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
            (s_left - left_f) * h_span, (bottom_f - s_bottom) * w_span)
        return jnp.maximum(bl_l, a), jnp.minimum(bl_b, bv), bl_f | f

    if "D" in skip:
        tr_r, tr_t, tr_f = big, -big, fbool
        tl_l, tl_t, tl_f = -big, -big, fbool
        br_r, br_b, br_f = big, big, fbool
        bl_l, bl_b, bl_f = -big, big, fbool
    else:
        # corner bands additionally gate on the shrunk-coordinate bounds:
        # a tile where min(xs - shrink) >= right_f has no px with
        # s_right < right_f, so the whole band mask is false there (and
        # likewise for the other three corners) — identity contributions.
        def skip_tr(ti, tj):
            return (no_relevant(ti, tj) | (tables_ref[1, ti, tj] >= right_f)
                    | (tables_ref[3, ti, tj] <= top_f))

        def skip_tl(ti, tj):
            return (no_relevant(ti, tj) | (tables_ref[2, ti, tj] <= left_f)
                    | (tables_ref[3, ti, tj] <= top_f))

        def skip_br(ti, tj):
            return (no_relevant(ti, tj) | (tables_ref[1, ti, tj] >= right_f)
                    | (tables_ref[4, ti, tj] >= bottom_f))

        def skip_bl(ti, tj):
            return (no_relevant(ti, tj) | (tables_ref[2, ti, tj] <= left_f)
                    | (tables_ref[4, ti, tj] >= bottom_f))

        tr_r, tr_t, tr_f = gregion(
            jnp.int32(0), t, r, jnp.int32(W - 1),
            skipping(skip_tr, passD_tr), (big, -big, fbool))
        tl_l, tl_t, tl_f = gregion(
            jnp.int32(0), t, jnp.int32(0), l,
            skipping(skip_tl, passD_tl), (-big, -big, fbool))
        br_r, br_b, br_f = gregion(
            b, jnp.int32(H - 1), r, jnp.int32(W - 1),
            skipping(skip_br, passD_br), (big, big, fbool))
        bl_l, bl_b, bl_f = gregion(
            b, jnp.int32(H - 1), jnp.int32(0), l,
            skipping(skip_bl, passD_bl), (-big, big, fbool))

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


def _kernel_grouped(seed_ref, tables_ref, img_ref, shrink_ref, out_ref, *,
                    W, H, TH, TW, S, seed_gate=True):
    """S co-resident seeds per grid program (round-5, VERDICT #3).

    Passes A / expansion / B are inherently per-seed (data-dependent
    rects) and run unrolled over the group, identical to _kernel. Passes
    C and D — which per seed jointly sweep nearly the whole image — are
    batched: ONE tile sweep serves all S seeds, so the per-tile scalar
    overhead (skip cond, VMEM tile load, loop bookkeeping) is paid once
    per group instead of once per seed-band. Per-seed region bounding is
    preserved as scalar tile-overlap tests folded into the shared skip
    predicate: a tile is visited iff at least one live seed's band/corner
    masks can be non-identity there, so every reduction receives exactly
    the same non-identity elements as _kernel and outputs are
    bit-identical (all-int min/max/or reductions are order-free).
    Blocked/pre-gated seeds contribute garbage bounds (unspecified by
    contract, masked via PyramidSet.valid) and never un-skip a tile.
    """
    p = pl.program_id(0)
    n_ti = H // TH
    n_tj = W // TW
    xs_base = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
    ys_base = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    big = jnp.int32(BIG)
    fbool = jnp.bool_(False)
    ftrue = jnp.bool_(True)

    # broadcast-identical across seeds (see inflate_pyramids prologue)
    edge_off = seed_ref[p * S, 8]
    ignore = seed_ref[p * S, 9]
    r_init = W - 1 - edge_off
    l_init = edge_off
    t_init = edge_off
    b_init = H - 1 - edge_off

    def tile(ti, tj):
        img = img_ref[pl.ds(tj * H + ti * TH, TH), :]
        return img, ys_base + ti * TH, xs_base + tj * TW

    def row_tiles(ya, yb):
        ta = jnp.clip(ya // TH, 0, n_ti)
        tb = jnp.clip(yb // TH + 1, 0, n_ti)
        return ta, jnp.maximum(ta, tb)

    def col_tiles(xa, xb):
        ta = jnp.clip(xa // TW, 0, n_tj)
        tb = jnp.clip(xb // TW + 1, 0, n_tj)
        return ta, jnp.maximum(ta, tb)

    # ---------- per-seed phase: A, expansion, B (as _kernel) ----------
    def rect_phase(row):
        x0 = seed_ref[row, 0]
        y0 = seed_ref[row, 1]
        minpyr = seed_ref[row, 2]
        l0 = seed_ref[row, 3]
        r0 = seed_ref[row, 4]
        t0 = seed_ref[row, 5]
        b0 = seed_ref[row, 6]
        ok = seed_ref[row, 7] > 0

        def no_blocker(ti, tj):
            return tables_ref[0, ti, tj] >= minpyr

        def skipping(pred_of, body):
            def wrapped(ti, tj, acc):
                return jax.lax.cond(
                    pred_of(ti, tj), lambda a: a,
                    lambda a: body(ti, tj, a), acc)
            return wrapped

        def region(ya, yb, xa, xb, body, init, gate=None):
            ra, rb = row_tiles(ya, yb)
            if gate is not None:
                rb = jnp.where(gate, rb, ra)
            ca, cb = col_tiles(xa, xb)

            def rows(ti, acc):
                return jax.lax.fori_loop(
                    ca, cb, lambda tj, a: body(ti, tj, a), acc)

            return jax.lax.fori_loop(ra, rb, rows, init)

        def passA(ti, tj, bad):
            img, ys, xs = tile(ti, tj)
            blocked = (img > ignore) & (img < minpyr)
            in_rect0 = (xs >= l0) & (xs <= r0) & (ys >= t0) & (ys <= b0)
            return bad | jnp.any(blocked & in_rect0)

        ok = ok & ~region(t0, b0, l0, r0, skipping(no_blocker, passA), fbool)

        def cond(st):
            l, r, t, b, rounds, changed = st
            return changed & (rounds < 8)

        def body(st):
            l, r, t, b, rounds, _ = st
            ra, rb = row_tiles(t, b)

            def col_line(tj, xmask_of):
                def compute(ti, acc):
                    mn, mx = acc
                    img, ys, xs = tile(ti, tj)
                    m = ((img > ignore) & (img < minpyr)
                         & (ys >= t) & (ys <= b) & xmask_of(xs))
                    mn = jnp.minimum(mn, jnp.min(jnp.where(m, xs, big)))
                    mx = jnp.maximum(mx, jnp.max(jnp.where(m, xs, -big)))
                    return mn, mx

                def one(ti, acc):
                    return jax.lax.cond(no_blocker(ti, tj), lambda a: a,
                                        lambda a: compute(ti, a), acc)
                return jax.lax.fori_loop(ra, rb, one, (big, -big))

            def right_cond(st2):
                tj, first_r = st2
                return (tj < n_tj) & (first_r == big)

            def right_body(st2):
                tj, first_r = st2
                mn, _ = col_line(tj, lambda xs: xs > r)
                return tj + 1, jnp.minimum(first_r, mn)

            _, first_r = jax.lax.while_loop(
                right_cond, right_body, (jnp.maximum((r + 1) // TW, 0), big))

            def left_cond(st2):
                tj, last_l = st2
                return (tj >= 0) & (last_l == -big)

            def left_body(st2):
                tj, last_l = st2
                _, mx = col_line(tj, lambda xs: xs < l)
                return tj - 1, jnp.maximum(last_l, mx)

            _, last_l = jax.lax.while_loop(
                left_cond, left_body,
                (jnp.minimum((l - 1) // TW, n_tj - 1), -big))

            r2 = jnp.maximum(r, jnp.minimum(first_r - 1, W - 1 - edge_off))
            l2 = jnp.minimum(l, jnp.maximum(last_l + 1, edge_off))

            ca2, cb2 = col_tiles(l2, r2)

            def row_line(ti, ymask_of):
                def compute(tj, acc):
                    mn, mx = acc
                    img, ys, xs = tile(ti, tj)
                    m = ((img > ignore) & (img < minpyr)
                         & (xs >= l2) & (xs <= r2) & ymask_of(ys))
                    mn = jnp.minimum(mn, jnp.min(jnp.where(m, ys, big)))
                    mx = jnp.maximum(mx, jnp.max(jnp.where(m, ys, -big)))
                    return mn, mx

                def one(tj, acc):
                    return jax.lax.cond(no_blocker(ti, tj), lambda a: a,
                                        lambda a: compute(tj, a), acc)
                return jax.lax.fori_loop(ca2, cb2, one, (big, -big))

            def bot_cond(st2):
                ti, first_b = st2
                return (ti < n_ti) & (first_b == big)

            def bot_body(st2):
                ti, first_b = st2
                mn, _ = row_line(ti, lambda ys: ys > b)
                return ti + 1, jnp.minimum(first_b, mn)

            _, first_b = jax.lax.while_loop(
                bot_cond, bot_body, (jnp.maximum((b + 1) // TH, 0), big))

            def top_cond(st2):
                ti, last_t = st2
                return (ti >= 0) & (last_t == -big)

            def top_body(st2):
                ti, last_t = st2
                _, mx = row_line(ti, lambda ys: ys < t)
                return ti - 1, jnp.maximum(last_t, mx)

            _, last_t = jax.lax.while_loop(
                top_cond, top_body,
                (jnp.minimum((t - 1) // TH, n_ti - 1), -big))

            b2 = jnp.maximum(b, jnp.minimum(first_b - 1, H - 1 - edge_off))
            t2 = jnp.minimum(t, jnp.maximum(last_t + 1, edge_off))
            ch = (l2 != l) | (r2 != r) | (t2 != t) | (b2 != b)
            return (l2, r2, t2, b2, rounds + 1, ch)

        l, r, t, b, *_ = jax.lax.while_loop(
            cond, body, (l0, r0, t0, b0, jnp.int32(0), ok))

        def passB(ti, tj, cur):
            row_lo = ti * TH
            col_lo = tj * TW
            interior = ((row_lo >= t) & (row_lo + (TH - 1) <= b)
                        & (col_lo >= l) & (col_lo + (TW - 1) <= r))

            def fast(c):
                return jnp.minimum(c, tables_ref[0, ti, tj])

            def slow(c):
                img, ys, xs = tile(ti, tj)
                in_rect = (xs >= l) & (xs <= r) & (ys >= t) & (ys <= b)
                masked = jnp.where((img > ignore) & in_rect, img, big)
                return jnp.minimum(c, jnp.min(masked))

            return jax.lax.cond(interior, fast, slow, cur)

        maxd = jnp.minimum(
            region(t, b, l, r, skipping(no_blocker, passB), big, gate=ok),
            jnp.int32(65535))
        return [x0, y0, minpyr, ok, l, r, t, b, maxd]

    seeds = [rect_phase(p * S + s) for s in range(S)]

    any_ok = functools.reduce(lambda a, b: a | b, [sd[3] for sd in seeds])
    live_maxd = functools.reduce(
        jnp.maximum,
        [jnp.where(sd[3], sd[8], jnp.int32(0)) for sd in seeds])

    def band_tile(band, primary, alt_hi, alt_lo, seed_main, seed_alt,
                  is_min):
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

    def full_sweep(skip_of, body, init):
        """Full-image tile sweep, trip-gated on any_ok, with a shared
        per-tile skip cond (identity contributions when it holds)."""
        rb = jnp.where(any_ok, jnp.int32(n_ti), jnp.int32(0))

        def one(ti, tj, acc):
            return jax.lax.cond(
                skip_of(ti, tj), lambda a: a, lambda a: body(ti, tj, a),
                acc)

        def rows(ti, acc):
            return jax.lax.fori_loop(
                0, n_tj, lambda tj, a: one(ti, tj, a), acc)

        return jax.lax.fori_loop(0, rb, rows, init)

    # ---------- batched pass C: one sweep for all S seeds ----------
    def tile_extent(ti, tj):
        row_lo = ti * TH
        col_lo = tj * TW
        return row_lo, row_lo + (TH - 1), col_lo, col_lo + (TW - 1)

    def c_irrelevant(ti, tj, sd):
        """Tile contributes only identity to seed sd's pass C: either no
        pixel relevant at its maxd, or it intersects none of its 4 band
        regions (the band masks would all be false everywhere)."""
        x0, y0, minpyr, ok, l, r, t, b, maxd = sd
        row_lo, row_hi, col_lo, col_hi = tile_extent(ti, tj)
        no_rel = tables_ref[0, ti, tj] >= maxd
        rows_mid = (row_hi >= t) & (row_lo <= b)
        cols_mid = (col_hi >= l) & (col_lo <= r)
        in_right = (col_hi >= r) & rows_mid
        in_left = (col_lo <= l) & rows_mid
        in_top = (row_lo <= t) & cols_mid
        in_bot = (row_hi >= b) & cols_mid
        return no_rel | ~(in_right | in_left | in_top | in_bot) | ~ok

    def skipC(ti, tj):
        sk = tables_ref[0, ti, tj] >= live_maxd
        for sd in seeds:
            sk = sk & c_irrelevant(ti, tj, sd)
        return sk

    def passC_all(ti, tj, acc):
        img, ys, xs = tile(ti, tj)
        shrink = shrink_ref[pl.ds(tj * H + ti * TH, TH), :]
        s_right = xs - shrink
        s_left = xs + shrink
        s_top = ys + shrink
        s_bottom = ys - shrink
        valid = img > ignore
        out = []
        for s in range(S):
            acc16 = tuple(acc[16 * s:16 * s + 16])

            def compute(a, sd=seeds[s]):
                x0, y0, minpyr, ok, l, r, t, b, maxd = sd
                (re_, rhi, rlo, rfl, le_, lhi, llo, lfl,
                 te_, thi, tlo, tfl, be_, bhi, blo, bfl) = a
                relevant = valid & (img < maxd)
                band = relevant & (xs >= r) & (ys >= t) & (ys <= b)
                e, h, lo_, f = band_tile(band, s_right, s_top, s_bottom,
                                         x0, y0, True)
                re_, rhi = jnp.minimum(re_, e), jnp.maximum(rhi, h)
                rlo, rfl = jnp.minimum(rlo, lo_), rfl | f
                band = relevant & (xs <= l) & (ys >= t) & (ys <= b)
                e, h, lo_, f = band_tile(band, s_left, s_top, s_bottom,
                                         x0, y0, False)
                le_, lhi = jnp.maximum(le_, e), jnp.maximum(lhi, h)
                llo, lfl = jnp.minimum(llo, lo_), lfl | f
                band = relevant & (ys <= t) & (xs >= l) & (xs <= r)
                e, h, lo_, f = band_tile(band, s_top, s_left, s_right,
                                         y0, x0, False)
                te_, thi = jnp.maximum(te_, e), jnp.maximum(thi, h)
                tlo, tfl = jnp.minimum(tlo, lo_), tfl | f
                band = relevant & (ys >= b) & (xs >= l) & (xs <= r)
                e, h, lo_, f = band_tile(band, s_bottom, s_left, s_right,
                                         y0, x0, True)
                be_, bhi = jnp.minimum(be_, e), jnp.maximum(bhi, h)
                blo, bfl = jnp.minimum(blo, lo_), bfl | f
                return (re_, rhi, rlo, rfl, le_, lhi, llo, lfl,
                        te_, thi, tlo, tfl, be_, bhi, blo, bfl)

            if seed_gate:
                # seeds irrelevant in THIS tile pay one scalar predicate
                # instead of 4 bands of vector math (identity-contribution
                # argument as skipC, so still bit-exact)
                new16 = jax.lax.cond(
                    c_irrelevant(ti, tj, seeds[s]), lambda a: a, compute,
                    acc16)
            else:
                new16 = compute(acc16)
            out += list(new16)
        return tuple(out)

    c_init = tuple(
        v for _ in range(S)
        for v in (big, -big, big, fbool, -big, -big, big, fbool,
                  -big, -big, big, fbool, big, -big, big, fbool))
    c_acc = full_sweep(skipC, passC_all, c_init)

    # per-seed edge combine (exactly _kernel's scalar epilogue)
    edges = []
    for s in range(S):
        x0, y0, minpyr, ok, l, r, t, b, maxd = seeds[s]
        (re_, rhi, rlo, rfl, le_, lhi, llo, lfl,
         te_, thi, tlo, tfl, be_, bhi, blo, bfl) = c_acc[16 * s:16 * s + 16]
        right_e = jnp.minimum(re_, r_init)
        left_e = jnp.maximum(le_, l_init)
        top_e = jnp.maximum(te_, t_init)
        bot_e = jnp.minimum(be_, b_init)
        ok = ok & ~(rfl | lfl | tfl | bfl)
        right_f = jnp.minimum(right_e, jnp.minimum(tlo, blo))
        left_f = jnp.maximum(left_e, jnp.maximum(thi, bhi))
        top_f = jnp.maximum(top_e, jnp.maximum(rhi, lhi))
        bottom_f = jnp.minimum(bot_e, jnp.minimum(rlo, llo))
        seeds[s][3] = ok
        edges.append([right_f, top_f, left_f, bottom_f])

    # ---------- batched pass D: one sweep for all S seeds ----------
    def corner_tile(band, s_a, a_is_min, a_seed_ok, s_b, b_is_min,
                    b_seed_ok, a_loss, b_loss):
        both_bad = band & ~a_seed_ok & ~b_seed_ok
        use_a = band & a_seed_ok & (~b_seed_ok | (b_loss > a_loss))
        use_b = band & b_seed_ok & ~use_a
        a_val = jnp.where(use_a, s_a, big if a_is_min else -big)
        a_val = jnp.min(a_val) if a_is_min else jnp.max(a_val)
        b_val = jnp.where(use_b, s_b, big if b_is_min else -big)
        b_val = jnp.min(b_val) if b_is_min else jnp.max(b_val)
        return a_val, b_val, jnp.any(both_bad)

    def d_irrelevant(ti, tj, sd, eg):
        """Identity for seed sd's pass D: no relevant pixel, or every
        corner's region/shrunk-bound gate excludes the tile (the per-
        corner skip_tr/skip_tl/skip_br/skip_bl of _kernel plus the
        corner-region overlap tests)."""
        x0, y0, minpyr, ok, l, r, t, b, maxd = sd
        right_f, top_f, left_f, bottom_f = eg
        row_lo, row_hi, col_lo, col_hi = tile_extent(ti, tj)
        no_rel = tables_ref[0, ti, tj] >= maxd
        rows_top = row_lo <= t
        rows_bot = row_hi >= b
        cols_right = col_hi >= r
        cols_left = col_lo <= l
        no_sr = tables_ref[1, ti, tj] >= right_f
        no_sl = tables_ref[2, ti, tj] <= left_f
        no_st = tables_ref[3, ti, tj] <= top_f
        no_sb = tables_ref[4, ti, tj] >= bottom_f
        tr_id = ~(rows_top & cols_right) | no_sr | no_st
        tl_id = ~(rows_top & cols_left) | no_sl | no_st
        br_id = ~(rows_bot & cols_right) | no_sr | no_sb
        bl_id = ~(rows_bot & cols_left) | no_sl | no_sb
        return no_rel | (tr_id & tl_id & br_id & bl_id) | ~ok

    def skipD(ti, tj):
        sk = ftrue
        for s in range(S):
            sk = sk & d_irrelevant(ti, tj, seeds[s], edges[s])
        return sk

    spans = []
    for s in range(S):
        right_f, top_f, left_f, bottom_f = edges[s]
        spans.append((jnp.maximum(bottom_f - top_f, 1),
                      jnp.maximum(right_f - left_f, 1)))

    def passD_all(ti, tj, acc):
        img, ys, xs = tile(ti, tj)
        shrink = shrink_ref[pl.ds(tj * H + ti * TH, TH), :]
        s_right = xs - shrink
        s_left = xs + shrink
        s_top = ys + shrink
        s_bottom = ys - shrink
        valid = img > ignore
        out = []
        for s in range(S):
            acc12 = tuple(acc[12 * s:12 * s + 12])

            def compute(a, sd=seeds[s], eg=edges[s], sp=spans[s]):
                x0, y0, minpyr, ok, l, r, t, b, maxd = sd
                right_f, top_f, left_f, bottom_f = eg
                h_span, w_span = sp
                (tr_r, tr_t, tr_f, tl_l, tl_t, tl_f,
                 br_r, br_b, br_f, bl_l, bl_b, bl_f) = a
                relevant = valid & (img < maxd)
                band = (relevant & (xs >= r) & (ys <= t)
                        & (s_right < right_f) & (s_top > top_f))
                av, bv, f = corner_tile(
                    band, s_right, True, x0 < s_right - PIXEL_BUFFER,
                    s_top, False, y0 > s_top + PIXEL_BUFFER,
                    (right_f - s_right) * h_span, (s_top - top_f) * w_span)
                tr_r, tr_t, tr_f = (jnp.minimum(tr_r, av),
                                    jnp.maximum(tr_t, bv), tr_f | f)
                band = (relevant & (xs <= l) & (ys <= t)
                        & (s_left > left_f) & (s_top > top_f))
                av, bv, f = corner_tile(
                    band, s_left, False, x0 > s_left + PIXEL_BUFFER,
                    s_top, False, y0 > s_top + PIXEL_BUFFER,
                    (s_left - left_f) * h_span, (s_top - top_f) * w_span)
                tl_l, tl_t, tl_f = (jnp.maximum(tl_l, av),
                                    jnp.maximum(tl_t, bv), tl_f | f)
                band = (relevant & (xs >= r) & (ys >= b)
                        & (s_right < right_f) & (s_bottom < bottom_f))
                av, bv, f = corner_tile(
                    band, s_right, True, x0 < s_right - PIXEL_BUFFER,
                    s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
                    (right_f - s_right) * h_span,
                    (bottom_f - s_bottom) * w_span)
                br_r, br_b, br_f = (jnp.minimum(br_r, av),
                                    jnp.minimum(br_b, bv), br_f | f)
                band = (relevant & (xs <= l) & (ys >= b)
                        & (s_left > left_f) & (s_bottom < bottom_f))
                av, bv, f = corner_tile(
                    band, s_left, False, x0 > s_left + PIXEL_BUFFER,
                    s_bottom, True, y0 < s_bottom - PIXEL_BUFFER,
                    (s_left - left_f) * h_span,
                    (bottom_f - s_bottom) * w_span)
                bl_l, bl_b, bl_f = (jnp.maximum(bl_l, av),
                                    jnp.minimum(bl_b, bv), bl_f | f)
                return (tr_r, tr_t, tr_f, tl_l, tl_t, tl_f,
                        br_r, br_b, br_f, bl_l, bl_b, bl_f)

            if seed_gate:
                new12 = jax.lax.cond(
                    d_irrelevant(ti, tj, seeds[s], edges[s]),
                    lambda a: a, compute, acc12)
            else:
                new12 = compute(acc12)
            out += list(new12)
        return tuple(out)

    d_init = tuple(
        v for _ in range(S)
        for v in (big, -big, fbool, -big, -big, fbool,
                  big, big, fbool, -big, big, fbool))
    d_acc = full_sweep(skipD, passD_all, d_init)

    for s in range(S):
        x0, y0, minpyr, ok, l, r, t, b, maxd = seeds[s]
        right_f, top_f, left_f, bottom_f = edges[s]
        (tr_r, tr_t, tr_f, tl_l, tl_t, tl_f,
         br_r, br_b, br_f, bl_l, bl_b, bl_f) = d_acc[12 * s:12 * s + 12]
        right_f = jnp.minimum(right_f, jnp.minimum(tr_r, br_r))
        top_f = jnp.maximum(top_f, jnp.maximum(tr_t, tl_t))
        left_f = jnp.maximum(left_f, jnp.maximum(tl_l, bl_l))
        bottom_f = jnp.minimum(bottom_f, jnp.minimum(br_b, bl_b))
        ok = ok & ~(tr_f | br_f | tl_f | bl_f)
        ok = ok & (left_f + PIXEL_BUFFER < right_f - PIXEL_BUFFER)
        ok = ok & (top_f + PIXEL_BUFFER < bottom_f - PIXEL_BUFFER)
        ok = ok & (x0 > left_f + PIXEL_BUFFER) & (x0 < right_f - PIXEL_BUFFER)
        ok = ok & (y0 > top_f + PIXEL_BUFFER) & (y0 < bottom_f - PIXEL_BUFFER)
        row = jnp.stack(
            [ok.astype(jnp.int32), maxd, right_f, top_f, left_f, bottom_f,
             jnp.int32(0), jnp.int32(0)]
        ).reshape(1, 8)
        out_ref[pl.ds(p * S + s, 1), :] = row


def inflate_pyramids(params, depth_u16, x0s, y0s, min_depths,
                     shrink_extra: int = 0, interpret: bool = False,
                     tile_h: int | None = None, tile_w: int | None = None,
                     seeds_per_program: int | None = None,
                     _grouped_seed_gate: bool = True,
                     _skip_passes: frozenset = frozenset()):
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
    if H % TH != 0 or (TH % 8 != 0 and TH != H):
        raise ValueError(f"tile_h={TH} must divide H={H} and be a multiple of 8")
    TW = _tile_w(W) if tile_w is None else int(tile_w)
    if W % TW != 0:
        raise ValueError(f"tile_w={TW} must divide W={W}")
    n_tj = W // TW

    def col_major(a):
        # (H, W) -> (n_tj * H, TW): tile (ti, tj) at rows tj*H + ti*TH
        return a.reshape(H, n_tj, TW).swapaxes(0, 1).reshape(n_tj * H, TW)

    # Per-tile aggregate tables over valid (img > ignore) pixels, shared
    # across all P seeds; they feed the kernel's bit-exact tile skips
    # (~80% of pass C/D tile visits on cluttered scenes) and pass B's
    # interior-tile fast path. Fill values are the reductions' identities.
    n_ti = H // TH
    xs_g = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys_g = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    valid = img > ignore

    def tile_reduce(a, fill, is_min):
        a = jnp.where(valid, a, fill).reshape(n_ti, TH, n_tj, TW)
        return a.min(axis=(1, 3)) if is_min else a.max(axis=(1, 3))

    big = jnp.int32(BIG)
    tables = jnp.stack([
        tile_reduce(img, big, True),              # [0] min img
        tile_reduce(xs_g - shrink_px, big, True),   # [1] min s_right
        tile_reduce(xs_g + shrink_px, -big, False),  # [2] max s_left
        tile_reduce(ys_g + shrink_px, -big, False),  # [3] max s_top
        tile_reduce(ys_g - shrink_px, big, True),   # [4] min s_bottom
    ])  # (5, n_ti, n_tj)

    # _skip_passes is a PROFILING knob only ({"expand","B","C","D"}):
    # gated passes are replaced by identity results at trace time, so the
    # timing difference vs the full kernel isolates one pass's cost.
    # Outputs are garbage whenever it is non-empty.
    S = DEFAULT_SEEDS_PER_PROGRAM if seeds_per_program is None else int(seeds_per_program)
    if S > 1 and _skip_passes:
        raise ValueError("_skip_passes profiling knob requires seeds_per_program=1")
    if S > 1:
        Ppad = -(-P // S) * S
        if Ppad != P:
            # padding seeds carry row 0's (always-legal) scalars with the
            # ok flag cleared: they early-out in the kernel, never
            # un-skip a tile, and their rows are sliced off below.
            pad = jnp.tile(seeds[:1], (Ppad - P, 1)).at[:, 7].set(0)
            seeds = jnp.concatenate([seeds, pad], axis=0)
        kernel = functools.partial(_kernel_grouped, W=W, H=H, TH=TH, TW=TW,
                                   S=S, seed_gate=bool(_grouped_seed_gate))
        grid = (Ppad // S,)
        n_out = Ppad
    else:
        kernel = functools.partial(_kernel, W=W, H=H, TH=TH, TW=TW,
                                   skip=frozenset(_skip_passes))
        grid = (P,)
        n_out = P
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_out, 8), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_tj * H, TW), lambda p, s, tb: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tj * H, TW), lambda p, s, tb: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_out, 8), lambda p, s, tb: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seeds, tables, col_major(img), col_major(shrink_px))

    ok = out[:P, 0] > 0
    maxd = out[:P, 1]
    edges = out[:P, 2:6]  # [right, top, left, bottom]
    return ok, maxd, edges
