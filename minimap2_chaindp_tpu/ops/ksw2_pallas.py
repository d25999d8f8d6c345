"""Pallas TPU wavefront kernel for batched dual-affine-gap extension (ksw2
extd2) — the second hot compute path after chaining DP.

TPU-native design (SURVEY.md §7.6): the reference's anti-diagonal
("rotated") difference DP (ksw2_extd2_sse.c:26-47) is already the right
dataflow for a wavefront machine — diagonal r depends only on r-1, and the
state rows u, v, x, y, x2, y2 are per-band vectors.  This kernel runs SUBL
independent extension problems in lockstep on the VPU sublanes, scanning the
per-diagonal band in 128-lane chunks, and writes the backtrack-byte matrix
`p` to HBM in RBLK-diagonal tiles via the Pallas grid.  Scores are carried in
int32 with explicit int8 wraparound emulation so stale-lane behavior matches
the reference's 16-lane SSE build bit-exactly (required for byte-identical
CIGARs); the band start/end per diagonal uses the reference's 16-alignment
(ksw2_extd2_sse.c:139) and the exact-max H row reproduces its lane-of-4
tie-breaking scan order (:315-358).

CIGAR backtrack stays on host (O(qlen+tlen), ksw2.h:119-151 semantics) using
the closed-form per-diagonal band offsets, which the host recomputes
deterministically from (qlen, tlen, w).

Everything is validated against ops/ksw2.py (the NumPy model that is itself
bit-exact against the reference kernels, see tests/test_ksw2_golden.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ksw2 as K

LANES = 128
SUBL = 16
RBLK = 8           # diagonals per grid step
NEG = -0x80000000
KSW_NEG_INF = K.KSW_NEG_INF

# scal_ref column assignments (per-job scalar state carried across diagonals)
# C_BX1/C_BX21/C_BV1 cache the raw previous-row x/x2/v at lane st(r)-1 so no
# separate extraction pass is needed (writes never touch lanes < st, so the
# cache stays valid while st is unchanged and is refreshed when st advances)
C_LAST_ST, C_LAST_EN, C_MAX, C_MAX_T, C_MAX_Q, C_MQE, C_MQE_T, C_MTE, \
    C_MTE_Q, C_SCORE, C_ZDROP, C_DONE, C_H0, C_H0T, C_BX1, C_BX21, \
    C_BV1 = range(17)

# meta column assignments (per-job static inputs); EXTZ/SCONLY/ENDB feed the
# fused on-chip backtrack's walk-start decision (mm_align's ksw_backtrack
# entry conditions, align.c / ksw2.h:119)
M_QLEN, M_TLEN, M_W, M_ZDROP, M_RIGHT, M_APPROX, M_ADROP, M_EXTZ, \
    M_SCONLY, M_ENDB = range(10)

# ez_ref fin columns written by the fused walk (beyond the scal C_* range)
C_FIN_I, C_FIN_J, C_FIN_K = 20, 21, 22

# fused-walk stripe geometry (p rows per DMA refill)
W_STRIPE = 56
W_MARGIN = 8
W_SROWS = W_STRIPE + 2 * W_MARGIN


def _w8(x):
    """int8 wraparound of an int32 vector (sign-extend the low byte)."""
    return ((x & 255) ^ 128) - 128


def _band(r, qlen, tlen, w, splice=False):
    """Per-diagonal band bounds (reference ksw2_extd2_sse.c:131-139);
    the splice kernel is unbanded (ksw2_exts2_sse.c:141)."""
    if splice:
        st0 = jnp.maximum(0, r - qlen + 1) + 0 * w
        en0 = jnp.minimum(tlen - 1, r)
    else:
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    return st0, en0, st, en


def _extract(arr, lane_t, idx, cond):
    """(SUBL,1) value of `arr` at per-job absolute lane `idx` (masked max)."""
    hit = (lane_t == idx) & cond
    return jnp.max(jnp.where(hit, arr, NEG), axis=1, keepdims=True)


def _fused_walk(meta_ref, scal_ref, ez_ref, ops_ref, p_any, stripe, base_smem,
                sem, *, rmax, ncol, opcap, splice):
    # ops_ref bound: every step decrements i and/or j, so the walk takes
    # at most i0 + j0 + 2 <= rmax + 1 steps, and the LANES-aligned buffer
    # flush offsets stay < opcap = rmax + 2*LANES rounded up (the caller's
    # allocation) — opcap is not consulted at runtime, it documents and
    # sizes that invariant.
    """On-chip CIGAR backtrack, fused onto the forward kernel's last grid
    step: the walk-start corner is decided from the just-computed ez state
    (the ksw_backtrack entry conditions the host would apply, ksw2.h:119 and
    align.c:543-620), p rows are stripe-DMA'd back from HBM, and only O(rows)
    step codes ship to the host.  Reads p through the C flat-layout spill
    aliasing (see ops/ksw2_backtrack.py for the standalone form and the
    host-validated semantics)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    oplane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    g = pl.program_id(0)
    row_max = max(rmax - W_SROWS, 0)

    def base_of(r):
        return base_smem[0, jnp.clip(r, 0, rmax - 1)]

    for s in range(SUBL):
        qlen = meta_ref[s, M_QLEN]
        tlen = meta_ref[s, M_TLEN]
        wj = meta_ref[s, M_W]
        sconly = meta_ref[s, M_SCONLY]
        extz = meta_ref[s, M_EXTZ]
        endb = meta_ref[s, M_ENDB]
        zdropped = scal_ref[s, C_ZDROP] != 0
        maxv = scal_ref[s, C_MAX]
        max_t = scal_ref[s, C_MAX_T]
        max_q = scal_ref[s, C_MAX_Q]
        mqe = scal_ref[s, C_MQE]
        mqe_t = scal_ref[s, C_MQE_T]

        # walk-start decision (mirrors the host's backtrack entry order)
        reach_end = jnp.logical_and(
            jnp.logical_and(extz != 0, ~zdropped),
            mqe + endb > maxv) if not splice else jnp.bool_(False)
        full = jnp.logical_and(~zdropped, extz == 0)
        have_max = jnp.logical_and(max_t >= 0, max_q >= 0)
        i0 = jnp.where(reach_end, mqe_t,
                       jnp.where(full, tlen - 1, max_t))
        j0 = jnp.where(reach_end | full, qlen - 1, max_q)
        active = jnp.logical_and(sconly == 0,
                                 reach_end | full | have_max)

        # C flat-layout row stride (ksw2_extd2_sse.c:98-100 / exts2:96)
        mqt = jnp.minimum(qlen, tlen)
        if splice:
            ncolc = (mqt + 15) // 16 * 16 + 16
        else:
            ncolc = ((jnp.minimum(mqt, wj + 1) + 15) // 16 + 1) * 16

        def band(r):
            _, _, st, en = _band(r, qlen, tlen, wj, splice)
            return st, en

        def fetch_stripe(row_lo):
            cp = pltpu.make_async_copy(
                p_any.at[g, pl.ds(row_lo, W_SROWS), :, :], stripe, sem)
            cp.start()
            cp.wait()

        def pbyte(row_lo, rr, col):
            blk_r = pl.multiple_of((rr - row_lo) // 8 * 8, 8)
            off_r = (rr - row_lo) - blk_r
            blk_c = pl.multiple_of(col // LANES * LANES, LANES)
            off_c = col - blk_c
            tile = stripe[pl.ds(blk_r, 8), :, pl.ds(blk_c, LANES)][:, s, :]
            hit = (srow == off_r) & (lane == off_c)
            return jnp.max(jnp.where(hit, tile.astype(jnp.int32), 0))

        def flat_byte(row_lo, r, i):
            st_al = band(r)[0]
            pos = r * ncolc + (i - st_al)
            rr = pos // ncolc
            kk = pos - rr * ncolc
            rr_c = jnp.minimum(rr, rmax - 1)
            st_rr, en_rr = band(rr_c)
            live_rr = (rr < qlen + tlen - 1) & (kk < en_rr - st_rr + 1)
            rp = jnp.maximum(rr_c - 1, 0)
            st_rp, en_rp = band(rp)
            live_rp = (rr > 0) & (kk + ncolc < en_rp - st_rp + 1)
            src_r = jnp.where(live_rr, rr_c, rp)
            src_c = jnp.where(live_rr, st_rr + kk - base_of(rr_c),
                              st_rp + kk + ncolc - base_of(rp))
            src_c = jnp.clip(src_c, 0, ncol - 1)
            b = pbyte(row_lo, src_r, src_c)
            return jnp.where(live_rr | live_rp, b, 0)

        def cond(st6):
            i, j = st6[0], st6[1]
            return (i >= 0) & (j >= 0)

        def step(st6):
            i, j, state, k, row_lo, buf = st6
            r = i + j
            need = (r - 1 < row_lo) | (r + 1 >= row_lo + W_SROWS)
            new_lo = jnp.clip(r - W_STRIPE, 0, row_max)

            @pl.when(need)
            def _():
                fetch_stripe(new_lo)
            row_lo = jnp.where(need, new_lo, row_lo)

            st_al, en_al = band(r)
            force = jnp.where(i < st_al, 2, jnp.where(i > en_al, 1, -1))
            tmp = jnp.where(force >= 0, 0, flat_byte(row_lo, r, i))
            # state machine (ksw2.h:128-136)
            state1 = jnp.where(state == 0, tmp & 7,
                               jnp.where((tmp >> (state + 2)) & 1, state, 0))
            state1 = jnp.where(state1 == 0, tmp & 7, state1)
            state1 = jnp.where(force >= 0, force, state1)
            buf = jnp.where(oplane == k % LANES, state1, buf)

            @pl.when(k % LANES == LANES - 1)
            def _():
                off = pl.multiple_of(k - (LANES - 1), LANES)
                ops_ref[s:s + 1, pl.ds(off, LANES)] = buf
            is_m = state1 == 0
            is_del = (state1 == 1) | (state1 == 3)
            i = jnp.where(is_m | is_del, i - 1, i)
            j = jnp.where(is_m | ~is_del, j - 1, j)
            return (i, j, state1, k + 1, row_lo, buf)

        @pl.when(active)
        def _walk():
            lo0 = jnp.clip(i0 + j0 - W_STRIPE, 0, row_max)
            fetch_stripe(lo0)
            buf0 = jnp.zeros((1, LANES), jnp.int32)
            i, j, _, k, _, buf = jax.lax.while_loop(
                cond, step,
                (i0, j0, jnp.int32(0), jnp.int32(0), lo0, buf0))
            off = pl.multiple_of(k // LANES * LANES, LANES)

            @pl.when(k % LANES != 0)
            def _():
                ops_ref[s:s + 1, pl.ds(off, LANES)] = buf
            row = ez_ref[s:s + 1, :]
            row = jnp.where(oplane == C_FIN_I, i, row)
            row = jnp.where(oplane == C_FIN_J, j, row)
            row = jnp.where(oplane == C_FIN_K, k, row)
            ez_ref[s:s + 1, :] = row


def _ksw_kernel(sf_ref, qr_ref, dac_ref, meta_ref, p_ref, ez_ref,
                *rest, q, e, q2, e2, mat0, sc_mis, sc_n,
                long_thres, long_diff, tws, qoff, rmax, ncol, splice=False,
                walk=False, opcap=0):
    if walk:
        (ops_ref, u_ref, v_ref, x_ref, y_ref, x2_ref, y2_ref, s_ref, h_ref,
         scal_ref, dst_ref, stage_ref, stripe_ref, base_smem, pend_ref, wsem,
         rsem) = rest
    else:
        (u_ref, v_ref, x_ref, y_ref, x2_ref, y2_ref, s_ref, h_ref,
         scal_ref, dst_ref) = rest
    # splice mode (ksw2_exts2_sse.c): unbanded, no second insertion state,
    # x2 is the intron state driven by donor/acceptor signals (dac packs
    # donor in the low byte, acceptor in the second byte, sign-extended),
    # gap seeds tail to 0 past long_thres, zdrop length penalty is 0
    x2_init = -q2 if splice else -(q2 + e2)
    f_tail = 0 if splice else -e2
    zdrop_e = 0 if splice else e2
    nchunk = ncol // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
    qlen = meta_ref[:, M_QLEN:M_QLEN + 1]
    tlen = meta_ref[:, M_TLEN:M_TLEN + 1]
    wj = meta_ref[:, M_W:M_W + 1]
    zdropj = meta_ref[:, M_ZDROP:M_ZDROP + 1]
    right = meta_ref[:, M_RIGHT:M_RIGHT + 1] != 0
    approx = meta_ref[:, M_APPROX:M_APPROX + 1] != 0
    adrop = meta_ref[:, M_ADROP:M_ADROP + 1] != 0
    nrows = qlen + tlen - 1
    qe_, qe2_ = q + e, q2 + e2

    @pl.when(pl.program_id(1) == 0)
    def _init():
        u_ref[:, :] = jnp.full((SUBL, tws), -qe_, jnp.int32)
        v_ref[:, :] = jnp.full((SUBL, tws), -qe_, jnp.int32)
        x_ref[:, :] = jnp.full((SUBL, tws), -qe_, jnp.int32)
        y_ref[:, :] = jnp.full((SUBL, tws), -qe_, jnp.int32)
        x2_ref[:, :] = jnp.full((SUBL, tws), x2_init, jnp.int32)
        y2_ref[:, :] = jnp.full((SUBL, tws), x2_init, jnp.int32)
        s_ref[:, :] = jnp.zeros((SUBL, tws), jnp.int32)
        h_ref[:, :] = jnp.full((SUBL, tws), KSW_NEG_INF, jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
        m_neg1 = ((col == C_LAST_ST) | (col == C_LAST_EN) | (col == C_MAX_T)
                  | (col == C_MAX_Q) | (col == C_MQE_T) | (col == C_MTE_Q))
        m_ninf = (col == C_MQE) | (col == C_MTE) | (col == C_SCORE)
        scal_ref[:, :] = jnp.where(
            m_neg1, -1, jnp.where(m_ninf, KSW_NEG_INF, 0))

    def f_seed(r):
        """First-column seed value (reference ksw2_extd2_sse.c:141-155)."""
        return jnp.where(r == 0, -qe_,
                         jnp.where(r < long_thres, -e,
                                   jnp.where(r == long_thres, long_diff,
                                             f_tail)))

    neg1_c = jnp.full((SUBL, 1), NEG, jnp.int32)

    def row_body(i, _):
        r = pl.program_id(1) * RBLK + i
        done = scal_ref[:, C_DONE:C_DONE + 1] != 0
        act0 = (r < nrows) & ~done
        st0, en0, st, en = _band(r, qlen, tlen, wj, splice)
        st_n = _band(r + 1, qlen, tlen, wj, splice)[2]   # next row's aligned start
        closed = act0 & (st0 > en0)
        # band closed -> zdropped (reference :136-138)
        zd = scal_ref[:, C_ZDROP:C_ZDROP + 1]
        dn = scal_ref[:, C_DONE:C_DONE + 1]
        scal_ref[:, C_ZDROP:C_ZDROP + 1] = jnp.where(closed, 1, zd)
        scal_ref[:, C_DONE:C_DONE + 1] = jnp.where(closed, 1, dn)
        act = act0 & ~closed
        # common 128-aligned chunk base; min over ALL jobs with r < nrows
        # (independent of zdrop state so the host can reproduce it)
        st_all = jnp.where(r < nrows, st, 0x3FFFFFFF)
        base0 = jnp.min(st_all)
        base = jnp.where(base0 == 0x3FFFFFFF, 0, base0) // LANES * LANES
        if walk:
            base_smem[0, r] = base   # the fused walk's per-row base lookup
        s_end = st0 + 16 * ((en0 - st0) // 16 + 1)

        last_st = scal_ref[:, C_LAST_ST:C_LAST_ST + 1]
        last_en = scal_ref[:, C_LAST_EN:C_LAST_EN + 1]

        # previous-row boundary values at lane st-1, from the cache columns
        stm1 = st - 1
        in_last = (last_st <= stm1) & (stm1 <= last_en) & (st > 0)
        x1 = jnp.where(in_last, scal_ref[:, C_BX1:C_BX1 + 1], -qe_)
        x21 = jnp.where(in_last, scal_ref[:, C_BX21:C_BX21 + 1], x2_init)
        v1 = jnp.where(st > 0,
                       jnp.where(in_last, scal_ref[:, C_BV1:C_BV1 + 1], -qe_),
                       f_seed(r))
        fr = f_seed(r)
        neg1 = neg1_c
        en1 = st0 + (en0 - st0) // 4 * 4
        nr4 = jnp.maximum((en1 - st0) >> 2, 1)
        h0t = scal_ref[:, C_H0T:C_H0T + 1]

        # ---- single chunk pass: recurrence, d bytes, H row, all extracts
        def chunk1(c, carry):
            (xl, x2l, vl, h_en0m1, u_en0, v_en0, h_old_en0, h_en0_acc,
             v_h0t, u_h0t1, best_h, best_key, h_st0, xb, x2b, vb) = carry
            a0 = pl.multiple_of(base + c * LANES, LANES)
            t = a0 + lane
            in_band = act & (t >= st) & (t <= en)
            uc = u_ref[:, pl.ds(a0, LANES)]
            vc = v_ref[:, pl.ds(a0, LANES)]
            xc = x_ref[:, pl.ds(a0, LANES)]
            yc = y_ref[:, pl.ds(a0, LANES)]
            x2c = x2_ref[:, pl.ds(a0, LANES)]
            y2c = y2_ref[:, pl.ds(a0, LANES)]
            sc_old = s_ref[:, pl.ds(a0, LANES)]
            # scores s[t]: blocks of 16 from st0 (stale outside, :158-166)
            sq = sf_ref[:, pl.ds(a0, LANES)]
            # qr read starts at an arbitrary (unaligned) lane offset; Mosaic
            # vector loads need 128-aligned starts, so load two aligned
            # chunks and recombine with a dynamic circular shift
            qidx = qoff - r + a0
            qal = pl.multiple_of(qidx // LANES * LANES, LANES)
            sh = qidx - qal
            qa = pltpu.roll(qr_ref[:, pl.ds(qal, LANES)], LANES - sh, 1)
            qb = pltpu.roll(qr_ref[:, pl.ds(qal + LANES, LANES)],
                            LANES - sh, 1)
            stq = jnp.where(lane < LANES - sh, qa, qb)
            s_new = jnp.where((sq == 4) | (stq == 4), sc_n,
                              jnp.where(sq == stq, mat0, sc_mis))
            in_s = act & (t >= st0) & (t < s_end)
            s_cur = jnp.where(in_s, s_new, sc_old)
            s_ref[:, pl.ds(a0, LANES)] = s_cur
            # boundary injection at lane r (:141-149)
            inj = act & (t == r) & (en >= r)
            u_in = jnp.where(inj, fr, uc)
            y_in = jnp.where(inj, -qe_, yc)
            y2_in = jnp.where(inj, -qe2_, y2c)
            # shifted-by-one x/x2/v with cross-chunk carry + st injection
            def sh(cur, carry_in, bval):
                prev = pltpu.roll(cur, 1, 1)
                prev = jnp.where(lane == 0, carry_in, prev)
                return jnp.where(act & (t == st), bval, prev)
            xt1 = sh(xc, xl, x1)
            x2t1 = sh(x2c, x2l, x21)
            vt1 = sh(vc, vl, v1)
            new_xl = xc[:, LANES - 1:LANES]
            new_x2l = x2c[:, LANES - 1:LANES]
            new_vl = vc[:, LANES - 1:LANES]
            a_ = _w8(xt1 + vt1)
            b_ = _w8(y_in + u_in)
            a2_ = _w8(x2t1 + vt1)
            if splice:
                dac = dac_ref[:, pl.ds(a0, LANES)]
                dn_sig = _w8(dac)          # donor, low byte
                ac_sig = _w8(dac >> 8)     # acceptor, second byte
                a2cmp = _w8(a2_ + ac_sig)  # intron exit pays the acceptor
            else:
                b2_ = _w8(y2_in + u_in)
                a2cmp = a2_
            z = s_cur
            # backtrack direction bits, left- vs right-aligned gaps (:220-314)
            dl = jnp.where(a_ > z, 1, 0)
            dr = jnp.where(z > a_, 0, 1)
            z = jnp.maximum(z, a_)
            dl = jnp.where(b_ > z, 2, dl)
            dr = jnp.where(z > b_, dr, 2)
            z = jnp.maximum(z, b_)
            dl = jnp.where(a2cmp > z, 3, dl)
            dr = jnp.where(z > a2cmp, dr, 3)
            z = jnp.maximum(z, a2cmp)
            if not splice:
                dl = jnp.where(b2_ > z, 4, dl)
                dr = jnp.where(z > b2_, dr, 4)
                z = jnp.maximum(z, b2_)
            d = jnp.where(right, dr, dl)
            if not splice:   # exts2 has no match-score clamp
                z = jnp.minimum(z, mat0)
            u_n = _w8(z - vt1)
            v_n = _w8(z - u_in)
            tmp = _w8(z - q)
            ax = _w8(a_ - tmp)
            bx = _w8(b_ - tmp)
            tmp2 = _w8(z - q2)
            a2x = _w8(a2_ - tmp2)
            # right-aligned keeps >= 0, left-aligned > 0: single threshold
            rthr = jnp.where(right, -1, 0)
            cond_a = ax > rthr
            cond_b = bx > rthr
            x_n = _w8(jnp.where(cond_a, ax, 0) - qe_)
            y_n = _w8(jnp.where(cond_b, bx, 0) - qe_)
            d = d | jnp.where(cond_a, 0x08, 0) | jnp.where(cond_b, 0x10, 0)
            if splice:
                # intron state: open from H (donor-scored) or stay open with
                # no length penalty (ksw2_exts2_sse.c:236-249)
                cond_a2 = a2x > dn_sig - jnp.where(right, 1, 0)
                x2_n = _w8(jnp.maximum(a2x, dn_sig) - q2)
                y2_n = y2c
            else:
                b2x = _w8(b2_ - tmp2)
                cond_a2 = a2x > rthr
                cond_b2 = b2x > rthr
                x2_n = _w8(jnp.where(cond_a2, a2x, 0) - qe2_)
                y2_n = _w8(jnp.where(cond_b2, b2x, 0) - qe2_)
                d = d | jnp.where(cond_b2, 0x40, 0)
            d = d | jnp.where(cond_a2, 0x20, 0)
            u_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, u_n, uc)
            v_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, v_n, vc)
            x_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, x_n, xc)
            y_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, y_n, yc)
            x2_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, x2_n, x2c)
            y2_ref[:, pl.ds(a0, LANES)] = jnp.where(in_band, y2_n, y2c)
            doff = pl.multiple_of(i * ncol + c * LANES, LANES)
            dst_ref[:, pl.ds(doff, LANES)] = jnp.where(in_band, d, 0)
            un_eff = jnp.where(in_band, u_n, uc)
            vn_eff = jnp.where(in_band, v_n, vc)
            xn_eff = jnp.where(in_band, x_n, xc)
            x2n_eff = jnp.where(in_band, x2_n, x2c)
            # extracts for the H row, the approx tracker, and the next row's
            # boundary cache
            hc = h_ref[:, pl.ds(a0, LANES)]
            h_en0m1 = jnp.maximum(h_en0m1, _extract(hc, t, en0 - 1, act))
            h_old_en0 = jnp.maximum(h_old_en0, _extract(hc, t, en0, act))
            u_en0 = jnp.maximum(u_en0, _extract(un_eff, t, en0, act))
            v_en0 = jnp.maximum(v_en0, _extract(vn_eff, t, en0, act))
            v_h0t = jnp.maximum(v_h0t, _extract(vn_eff, t, h0t, act))
            u_h0t1 = jnp.maximum(u_h0t1, _extract(un_eff, t, h0t + 1, act))
            stn1 = st_n - 1
            xb = jnp.maximum(xb, _extract(xn_eff, t, stn1, act))
            x2b = jnp.maximum(x2b, _extract(x2n_eff, t, stn1, act))
            vb = jnp.maximum(vb, _extract(vn_eff, t, stn1, act))
            # H[en0] (:315-327): old H[en0-1] + new u[en0] / v-based forms;
            # all accumulators are complete by the chunk containing en0
            h_en0_v = jnp.where(r == 0, v_en0 - qe_,
                                jnp.where(en0 > 0, h_en0m1 + u_en0,
                                          h_old_en0 + v_en0))
            hit = jnp.max(jnp.where((t == en0) & act, 1, 0), axis=1,
                          keepdims=True)
            h_en0_acc = jnp.where(hit == 1, h_en0_v, h_en0_acc)
            in_upd = act & (t >= st0) & (t < en0)
            h_new = jnp.where(in_upd, hc + vn_eff, hc)
            h_new = jnp.where(act & (t == en0),
                              jnp.broadcast_to(h_en0_v, (SUBL, LANES)),
                              h_new)
            h_ref[:, pl.ds(a0, LANES)] = h_new
            # max over [st0, en0] with the reference's scan-order key:
            # en0 first, then the lane-of-4 block scan of [st0, en1), then
            # the trailing scalar loop [en1, en0)
            off = t - st0
            blk_key = 1 + (off & 3) * nr4 + (off >> 2)
            key = jnp.where(t == en0, 0,
                            jnp.where(t < en1, blk_key, 0x10000000 + t))
            cand = act & (t >= st0) & (t <= en0)
            hv = jnp.where(cand, h_new, KSW_NEG_INF - 1)
            cmax = jnp.max(hv, axis=1, keepdims=True)
            ckey = jnp.min(jnp.where(hv == cmax, key, 0x7FFFFFFF),
                           axis=1, keepdims=True)
            better = (cmax > best_h) | ((cmax == best_h) & (ckey < best_key))
            best_key = jnp.where(better, ckey, best_key)
            best_h = jnp.maximum(best_h, cmax)
            h_st0 = jnp.maximum(h_st0, _extract(h_new, t, st0, act))
            return (new_xl, new_x2l, new_vl, h_en0m1, u_en0, v_en0,
                    h_old_en0, h_en0_acc, v_h0t, u_h0t1, best_h, best_key,
                    h_st0, xb, x2b, vb)

        # width-1 band whose aligned start coincides with the group's
        # 128-aligned chunk base (en0 == st == base): lane en0-1 = base-1
        # lies below every scanned chunk, so seed the H[en0-1] accumulator
        # from the previous chunk — h_ref still holds it from the earlier
        # rows whose scan covered that lane (the model reads the same
        # stale H[en0-1], ksw2.py:331)
        need_prev = act & (en0 == base) & (base > 0)
        a0p = pl.multiple_of(jnp.maximum(base - LANES, 0), LANES)
        h_en0m1_0 = _extract(h_ref[:, pl.ds(a0p, LANES)], a0p + lane,
                             en0 - 1, need_prev)
        init1 = (neg1, neg1, neg1, h_en0m1_0, neg1, neg1, neg1, neg1,
                 neg1, neg1,
                 jnp.full((SUBL, 1), KSW_NEG_INF - 1, jnp.int32),
                 jnp.full((SUBL, 1), 0x7FFFFFFF, jnp.int32), neg1,
                 neg1, neg1, neg1)
        (_, _, _, _, _, v_en0, _, h_en0, v_h0t, u_h0t1, max_h, max_key,
         h_st0, xb, x2b, vb) = jax.lax.fori_loop(0, nchunk, chunk1, init1)

        # refresh the boundary cache for the next row: unchanged lane when
        # st stays put, freshly extracted when st advances
        adv = st_n > st
        scal_ref[:, C_BX1:C_BX1 + 1] = jnp.where(
            act & adv, xb, scal_ref[:, C_BX1:C_BX1 + 1])
        scal_ref[:, C_BX21:C_BX21 + 1] = jnp.where(
            act & adv, x2b, scal_ref[:, C_BX21:C_BX21 + 1])
        scal_ref[:, C_BV1:C_BV1 + 1] = jnp.where(
            act & adv, vb, scal_ref[:, C_BV1:C_BV1 + 1])

        # decode max_t from the key
        kk = max_key
        blk_t = st0 + ((kk - 1) % nr4) * 4 + (kk - 1) // nr4
        max_t = jnp.where(kk == 0, en0,
                          jnp.where(kk >= 0x10000000, kk - 0x10000000, blk_t))

        # ---- scalar epilogue (per job)
        ez_max = scal_ref[:, C_MAX:C_MAX + 1]
        ez_max_t = scal_ref[:, C_MAX_T:C_MAX_T + 1]
        ez_max_q = scal_ref[:, C_MAX_Q:C_MAX_Q + 1]

        def apply_zdrop(H, tt, upd_mask):
            """reference ksw_apply_zdrop (ksw2.h:160-176)."""
            better = upd_mask & (H > ez_max)
            cand2 = upd_mask & ~better & (tt >= ez_max_t) \
                & ((r - tt) >= ez_max_q)
            tl_ = tt - ez_max_t
            ql_ = (r - tt) - ez_max_q
            ll = jnp.abs(tl_ - ql_)
            dropped = cand2 & (zdropj >= 0) & (ez_max - H > zdropj + ll * zdrop_e)
            return better, dropped

        exact = act & ~approx
        bet, drp = apply_zdrop(max_h, max_t, exact)
        new_max = jnp.where(bet, max_h, ez_max)
        new_max_t = jnp.where(bet, max_t, ez_max_t)
        new_max_q = jnp.where(bet, r - max_t, ez_max_q)

        # mte / mqe (:338-345)
        mte = scal_ref[:, C_MTE:C_MTE + 1]
        mte_q = scal_ref[:, C_MTE_Q:C_MTE_Q + 1]
        mte_upd = exact & (en0 == tlen - 1) & (h_en0 > mte)
        scal_ref[:, C_MTE:C_MTE + 1] = jnp.where(mte_upd, h_en0, mte)
        scal_ref[:, C_MTE_Q:C_MTE_Q + 1] = jnp.where(mte_upd, r - en, mte_q)
        mqe = scal_ref[:, C_MQE:C_MQE + 1]
        mqe_t = scal_ref[:, C_MQE_T:C_MQE_T + 1]
        mqe_upd = exact & (r - st0 == qlen - 1) & (h_st0 > mqe)
        scal_ref[:, C_MQE:C_MQE + 1] = jnp.where(mqe_upd, h_st0, mqe)
        scal_ref[:, C_MQE_T:C_MQE_T + 1] = jnp.where(mqe_upd, st0, mqe_t)

        # approx-max greedy H0 tracker (:359-375)
        h0 = scal_ref[:, C_H0:C_H0 + 1]
        h0t = scal_ref[:, C_H0T:C_H0T + 1]
        in_both = (st0 <= h0t) & (h0t <= en0) & (st0 <= h0t + 1) \
            & (h0t + 1 <= en0)
        in_one = (st0 <= h0t) & (h0t <= en0)
        take_u = in_both & (u_h0t1 >= v_h0t)
        h0_new = jnp.where(r == 0, v_en0 - qe_,
                           jnp.where(in_both,
                                     h0 + jnp.maximum(v_h0t, u_h0t1),
                                     jnp.where(in_one, h0 + v_h0t,
                                               h0 + u_h0t1)))
        h0t_new = jnp.where(r == 0, 0,
                            jnp.where(in_both & take_u, h0t + 1,
                                      jnp.where(in_one, h0t, h0t + 1)))
        apx = act & approx
        scal_ref[:, C_H0:C_H0 + 1] = jnp.where(apx, h0_new, h0)
        scal_ref[:, C_H0T:C_H0T + 1] = jnp.where(apx, h0t_new, h0t)
        beta, drpa = apply_zdrop(h0_new, h0t_new, apx & adrop)
        new_max = jnp.where(beta, h0_new, new_max)
        new_max_t = jnp.where(beta, h0t_new, new_max_t)
        new_max_q = jnp.where(beta, r - h0t_new, new_max_q)
        scal_ref[:, C_MAX:C_MAX + 1] = new_max
        scal_ref[:, C_MAX_T:C_MAX_T + 1] = new_max_t
        scal_ref[:, C_MAX_Q:C_MAX_Q + 1] = new_max_q

        dropped = drp | drpa
        zd2 = scal_ref[:, C_ZDROP:C_ZDROP + 1]
        dn2 = scal_ref[:, C_DONE:C_DONE + 1]
        scal_ref[:, C_ZDROP:C_ZDROP + 1] = jnp.where(dropped, 1, zd2)
        scal_ref[:, C_DONE:C_DONE + 1] = jnp.where(dropped, 1, dn2)

        # final score (:356-358, 381-383) — only if not dropped this row
        fin = act & ~dropped & (r == nrows - 1) & (en0 == tlen - 1)
        sc_old2 = scal_ref[:, C_SCORE:C_SCORE + 1]
        scal_ref[:, C_SCORE:C_SCORE + 1] = jnp.where(
            fin, jnp.where(approx, h0_new, h_en0), sc_old2)
        scal_ref[:, C_DONE:C_DONE + 1] = jnp.where(
            act & (r == nrows - 1), 1, scal_ref[:, C_DONE:C_DONE + 1])

        scal_ref[:, C_LAST_ST:C_LAST_ST + 1] = jnp.where(act, st, last_st)
        scal_ref[:, C_LAST_EN:C_LAST_EN + 1] = jnp.where(act, en, last_en)
        return 0

    r0 = pl.program_id(1) * RBLK
    done_all = jnp.all((scal_ref[:, C_DONE:C_DONE + 1] != 0) | (r0 >= nrows))

    if walk:
        # no p-write outstanding at the very start (each group's walk phase
        # resets the flag, so only the first grid step needs this)
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_pend():
            pend_ref[0, 0] = -1

    @pl.when(~done_all)
    def _rows():
        jax.lax.fori_loop(0, RBLK, row_body, 0)
        if walk:
            # p lives in ANY (HBM) so the fused walk can stripe-DMA it
            # back; stage the block and write it with an ASYNC copy that is
            # awaited just before the stage buffer's next reuse (overlaps
            # the write DMA with the next row-block's compute)
            prev = pend_ref[0, 0]

            @pl.when(prev >= 0)
            def _wait_prev():
                pltpu.make_async_copy(
                    stage_ref,
                    p_ref.at[pl.program_id(0),
                             pl.ds(prev * RBLK, RBLK), :, :],
                    wsem).wait()
            for k in range(RBLK):
                stage_ref[k, :, :] = \
                    dst_ref[:, k * ncol:(k + 1) * ncol].astype(jnp.uint8)
            pltpu.make_async_copy(
                stage_ref,
                p_ref.at[pl.program_id(0),
                         pl.ds(pl.program_id(1) * RBLK, RBLK), :, :],
                wsem).start()
            pend_ref[0, 0] = pl.program_id(1)
        else:
            for k in range(RBLK):
                p_ref[0, k, :, :] = \
                    dst_ref[:, k * ncol:(k + 1) * ncol].astype(jnp.uint8)

    ez_ref[:, :] = scal_ref[:, :]

    if walk:
        @pl.when(pl.program_id(1) == rmax // RBLK - 1)
        def _walk_phase():
            # drain the outstanding p write before reading p back
            prev = pend_ref[0, 0]

            @pl.when(prev >= 0)
            def _drain():
                pltpu.make_async_copy(
                    stage_ref,
                    p_ref.at[pl.program_id(0),
                             pl.ds(prev * RBLK, RBLK), :, :],
                    wsem).wait()
            pend_ref[0, 0] = -1
            _fused_walk(meta_ref, scal_ref, ez_ref, ops_ref, p_ref,
                        stripe_ref, base_smem, rsem, rmax=rmax, ncol=ncol,
                        opcap=opcap, splice=splice)


@functools.partial(jax.jit, static_argnames=(
    "q", "e", "q2", "e2", "mat0", "sc_mis", "sc_n", "long_thres",
    "long_diff", "tws", "qoff", "rmax", "ncol", "splice", "walk",
    "interpret"))
def _ksw_call(sf, qr, dac, meta, *, q, e, q2, e2, mat0, sc_mis, sc_n,
              long_thres, long_diff, tws, qoff, rmax, ncol, splice=False,
              walk=False, interpret=False):
    # narrow dtypes cross the link; widen on device (sf/qr are bases 0..4,
    # dac packs two int8 signals)
    sf = sf.astype(jnp.int32)
    qr = qr.astype(jnp.int32)
    dac = dac.astype(jnp.int32)
    R = sf.shape[0]
    grid = (R // SUBL, rmax // RBLK)
    opcap = (rmax + 2 * LANES + LANES - 1) // LANES * LANES
    kern = functools.partial(
        _ksw_kernel, q=q, e=e, q2=q2, e2=e2, mat0=mat0, sc_mis=sc_mis,
        sc_n=sc_n, long_thres=long_thres, long_diff=long_diff, tws=tws,
        qoff=qoff, rmax=rmax, ncol=ncol, splice=splice, walk=walk,
        opcap=opcap)
    if interpret:
        # the Mosaic-TPU interpreter (the plain HLO interpreter lacks
        # program_id on the cpu backend)
        interpret = pltpu.InterpretParams()
    in_specs = [
        pl.BlockSpec((SUBL, tws), lambda g, rb: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUBL, qr.shape[1]), lambda g, rb: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUBL, tws), lambda g, rb: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUBL, LANES), lambda g, rb: (g, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((SUBL, tws), jnp.int32) for _ in range(8)] + \
              [pltpu.VMEM((SUBL, LANES), jnp.int32),
               pltpu.VMEM((SUBL, RBLK * ncol), jnp.int32)]
    if not walk:
        p, ez = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, RBLK, SUBL, ncol),
                             lambda g, rb: (g, rb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUBL, LANES), lambda g, rb: (g, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R // SUBL, rmax, SUBL, ncol),
                                     jnp.uint8),
                jax.ShapeDtypeStruct((R, LANES), jnp.int32),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(sf, qr, dac, meta)
        return p, ez
    # fused-walk mode: p stays in ANY (HBM, never fetched); the kernel also
    # emits the walk's step codes per job (fin coords land in ez columns
    # C_FIN_*) — one dispatch and one small fetch per bucket
    p, ez, ops = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((SUBL, LANES), lambda g, rb: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBL, opcap), lambda g, rb: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R // SUBL, rmax, SUBL, ncol), jnp.uint8),
            jax.ShapeDtypeStruct((R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, opcap), jnp.int32),
        ),
        scratch_shapes=scratch + [
            pltpu.VMEM((RBLK, SUBL, ncol), jnp.uint8),      # p write stage
            pltpu.VMEM((W_SROWS, SUBL, ncol), jnp.uint8),   # walk stripe
            pltpu.SMEM((1, rmax), jnp.int32),               # per-row base
            pltpu.SMEM((1, 1), jnp.int32),                  # pending p write
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(sf, qr, dac, meta)
    return p, ez, ops


def _p_flat_c_layout(p_rows, base, st, en, nrows, n_col):
    """Re-lay the kernel's per-diagonal p rows into the C kernel's FLAT
    byte array (row stride n_col, ksw2_extd2_sse.c:100).  The C stride can
    be narrower than the aligned band, so a row's tail spills into the next
    row's slots and is partially overwritten — the reference backtrack then
    reads those aliased bytes.  Replaying the writes in diagonal order
    reproduces that aliasing exactly (required for byte-identical CIGARs).

    NB a device-side gather repack was tried and reverted: XLA's gather on
    TPU made it slower AND ballooned compile time; if the p transfer ever
    dominates again, the right fix is a device-side backtrack kernel
    (stripe-DMA the p tiles backwards and walk the state machine on chip),
    which ships only O(nrows) cigar ops per job."""
    flat = np.zeros(nrows * n_col + 4 * n_col, dtype=np.uint8)
    for r in range(nrows):
        wd = en[r] - st[r] + 1
        if wd <= 0:
            continue
        lo = st[r] - base[r]
        flat[r * n_col:r * n_col + wd] = p_rows[r, lo:lo + wd]
    return flat


def plan_batch(jobs, q, e, q2, e2, splice=False):
    """Compute the static launch geometry for a batch of jobs.
    jobs: list of dicts with qseq/tseq (uint8 np arrays), w, zdrop,
    end_bonus, flag. Always returns a geometry — domain screening (job
    size/eligibility) happens in the caller (batch_align._eligible)."""
    if not splice and q2 + e2 < q + e:
        q, q2 = q2, q
        e, e2 = e2, e
    qlen = np.array([len(j["qseq"]) for j in jobs], dtype=np.int32)
    tlen = np.array([len(j["tseq"]) for j in jobs], dtype=np.int32)
    w = np.array([j["w"] if j["w"] >= 0 else max(len(j["qseq"]),
                                                 len(j["tseq"]))
                  for j in jobs], dtype=np.int32)
    nrows = qlen + tlen - 1
    rmax = int(nrows.max())
    rmax = (rmax + RBLK - 1) // RBLK * RBLK
    r = np.arange(rmax, dtype=np.int32)[:, None]
    if splice:
        st0 = np.maximum(0, r - qlen[None, :] + 1) + 0 * w[None, :]
        en0 = np.minimum(tlen[None, :] - 1, r) + 0 * w[None, :]
    else:
        st0 = np.maximum(np.maximum(0, r - qlen[None, :] + 1),
                         (r - w[None, :] + 1) >> 1)
        en0 = np.minimum(np.minimum(tlen[None, :] - 1, r),
                         (r + w[None, :]) >> 1)
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    live = r < nrows[None, :]
    st_m = np.where(live, st, 0x3FFFFFFF)
    en_m = np.where(live, en, -1)
    # the kernel computes the chunk base per SUBL-job GROUP — mirror that
    n_grp = (len(jobs) + SUBL - 1) // SUBL
    base = np.zeros((n_grp, rmax), dtype=np.int32)
    ncol = 1
    for g in range(n_grp):
        sl = slice(g * SUBL, min((g + 1) * SUBL, len(jobs)))
        bg = st_m[:, sl].min(axis=1)
        bg = np.where(bg == 0x3FFFFFFF, 0, bg) // LANES * LANES
        base[g] = bg
        ncol = max(ncol, int((en_m[:, sl].max(axis=1) - bg + 1).max()))
    ncol = (ncol + LANES - 1) // LANES * LANES
    tw16 = int(((tlen.max() + 15) // 16) * 16)
    tws = (tw16 + ncol + LANES + LANES - 1) // LANES * LANES
    return dict(q=int(q), e=int(e), q2=int(q2), e2=int(e2), rmax=rmax,
                ncol=ncol, tws=tws, qoff=rmax,
                base=base, st=st, en=en, st0=st0, en0=en0)


def _pow2_at_least(x, lo):
    v = lo
    while v < x:
        v *= 2
    return v


def _ez_from_row(ez_row) -> "K.Ez":
    res = K.Ez()
    res.zdropped = int(ez_row[C_ZDROP])
    res.max = int(ez_row[C_MAX])
    res.max_t = int(ez_row[C_MAX_T])
    res.max_q = int(ez_row[C_MAX_Q])
    res.mqe = int(ez_row[C_MQE])
    res.mqe_t = int(ez_row[C_MQE_T])
    res.mte = int(ez_row[C_MTE])
    res.mte_q = int(ez_row[C_MTE_Q])
    res.score = int(ez_row[C_SCORE])
    return res


def _decode_walk(jobs, out, ez_h, ops_h, *, splice, long_thres):
    """Host decode of the fused walk's step codes: mirrors the kernel's
    walk-start decision (same ez inputs, so deterministic agreement), then
    run-length encodes the codes into each ez.cigar."""
    from .ksw2_backtrack import decode_cigar
    for j, (job, res) in enumerate(zip(jobs, out)):
        flag = job["flag"]
        if flag & K.KSW_EZ_SCORE_ONLY:
            continue
        if not splice and not res.zdropped and (flag & K.KSW_EZ_EXTZ_ONLY) \
                and res.mqe + job["end_bonus"] > res.max:
            res.reach_end = 1
        elif not res.zdropped and not (flag & K.KSW_EZ_EXTZ_ONLY):
            pass
        elif res.max_t >= 0 and res.max_q >= 0:
            pass
        else:
            continue
        rev = bool(flag & K.KSW_EZ_REV_CIGAR)
        res.cigar = decode_cigar(
            ops_h[j], int(ez_h[j, C_FIN_K]), int(ez_h[j, C_FIN_I]),
            int(ez_h[j, C_FIN_J]), rev, long_thres if splice else 0)


def extd2_batch(jobs, mat, q, e, q2, e2, interpret=False, quantize=False,
                backtrack="host"):
    """Device-batched ksw_extd2 (synchronous driver of the staged form)."""
    return extd2_batch_async(jobs, mat, q, e, q2, e2, interpret=interpret,
                             quantize=quantize, backtrack=backtrack)()()



def _quantize_geom(geom):
    """Round the static launch geometry up to compile-cache-friendly
    steps (pow2 rmax/ncol, tws coupled to the ncol growth) — ONE rule
    shared by extd2_batch_async and exts2_batch_async so their launch
    geometry cannot drift apart."""
    rmax_q = _pow2_at_least(geom["rmax"], 256)
    ncol_q = _pow2_at_least(geom["ncol"], LANES)
    geom["tws"] = _pow2_at_least(geom["tws"] + (ncol_q - geom["ncol"]),
                                 2 * LANES)
    geom["rmax"], geom["ncol"], geom["qoff"] = rmax_q, ncol_q, rmax_q
    return geom

def extd2_batch_async(jobs, mat, q, e, q2, e2, interpret=False,
                      quantize=False, backtrack="host"):
    """Device-batched ksw_extd2: same per-job semantics as K.extd2.
    jobs: list of dicts(qseq, tseq, w, zdrop, end_bonus, flag).
    quantize=True rounds the static launch geometry (rmax/ncol/tws) up to
    powers of two so a long-running pipeline compiles a bounded set of
    kernel shapes (padding is masked out, results are unchanged).
    backtrack="device" decodes CIGARs with the on-chip walker
    (ops/ksw2_backtrack.py) so the p matrix never leaves the device.

    Three-stage protocol so a scheduler can overlap many batches' device
    work with host decode: this call DISPATCHES the forward kernel and
    returns `collect_ez`; collect_ez() blocks on the (small) ez scores,
    dispatches the backtrack walker if requested, and returns `collect_bt`;
    collect_bt() blocks on the walker and returns the list of K.Ez."""
    geom = plan_batch(jobs, q, e, q2, e2)
    # stripe min for the on-chip walker; ALSO pads qoff for the kernel's
    # dual-chunk query loads, so it stays on for host backtrack too (in
    # production quantize=True subsumes it: rmax -> pow2 >= 256)
    geom["rmax"] = max(geom["rmax"], 2 * LANES)
    geom["qoff"] = geom["rmax"]
    if quantize:
        _quantize_geom(geom)
    q, e, q2, e2 = geom["q"], geom["e"], geom["q2"], geom["e2"]
    if e != e2:
        long_thres = (q2 - q) // (e - e2) - 1
    else:
        long_thres = 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2

    n = len(jobs)
    R = (n + SUBL - 1) // SUBL * SUBL
    if quantize:
        R = _pow2_at_least(R, SUBL)
    tws, qoff, rmax, ncol = geom["tws"], geom["qoff"], geom["rmax"], \
        geom["ncol"]
    sf = np.zeros((R, tws), dtype=np.int8)
    qr = np.zeros((R, qoff + tws + LANES), dtype=np.int8)
    meta = np.zeros((R, LANES), dtype=np.int32)
    meta[:, M_QLEN] = 1  # keep padded rows harmless (nrows = 1)
    meta[:, M_SCONLY] = 1  # padded rows never walk
    for j, job in enumerate(jobs):
        qs, ts = job["qseq"], job["tseq"]
        sf[j, :len(ts)] = ts
        qr[j, qoff - (len(qs) - 1):qoff + 1] = qs[::-1].astype(np.int8)
        meta[j, M_QLEN] = len(qs)
        meta[j, M_TLEN] = len(ts)
        meta[j, M_W] = job["w"] if job["w"] >= 0 else max(len(qs), len(ts))
        meta[j, M_ZDROP] = job["zdrop"]
        flag = job["flag"]
        meta[j, M_RIGHT] = 1 if flag & K.KSW_EZ_RIGHT else 0
        meta[j, M_APPROX] = 1 if flag & K.KSW_EZ_APPROX_MAX else 0
        meta[j, M_ADROP] = 1 if flag & K.KSW_EZ_APPROX_DROP else 0
        meta[j, M_EXTZ] = 1 if flag & K.KSW_EZ_EXTZ_ONLY else 0
        meta[j, M_SCONLY] = 1 if flag & K.KSW_EZ_SCORE_ONLY else 0
        meta[j, M_ENDB] = job["end_bonus"]

    dac = np.zeros((R, tws), dtype=np.int16)
    walk = backtrack == "device"
    res_call = _ksw_call(
        jnp.asarray(sf), jnp.asarray(qr), jnp.asarray(dac), jnp.asarray(meta),
        q=q, e=e, q2=q2, e2=e2, mat0=int(mat[0]),
        sc_mis=int(np.int8(mat[1])), sc_n=-e2,
        long_thres=int(long_thres), long_diff=int(long_diff),
        tws=tws, qoff=qoff, rmax=rmax, ncol=ncol, walk=walk,
        interpret=interpret)

    def collect_ez():
        if walk:
            # single fetch cycle: ez (with fin coords) + step codes; the p
            # matrix never leaves the device
            _, ez, ops = res_call
            ez_h = np.asarray(ez)
            ops_h = np.asarray(ops)
            out = [_ez_from_row(ez_h[j]) for j in range(len(jobs))]
            _decode_walk(jobs, out, ez_h, ops_h, splice=False, long_thres=0)
            return lambda: out
        p, ez = res_call
        ez_h = np.asarray(ez)
        out = [_ez_from_row(ez_h[j]) for j in range(len(jobs))]
        p_h = None
        if any(not (job["flag"] & K.KSW_EZ_SCORE_ONLY) for job in jobs):
            p_h = np.asarray(p)   # big: only pull when a cigar is needed
        for j, (job, res) in enumerate(zip(jobs, out)):
            flag = job["flag"]
            qlen, tlen = len(job["qseq"]), len(job["tseq"])
            if flag & K.KSW_EZ_SCORE_ONLY:
                continue
            rev = bool(flag & K.KSW_EZ_REV_CIGAR)
            # C per-row p stride (ksw2_extd2_sse.c:98-100)
            wj = job["w"] if job["w"] >= 0 else max(qlen, tlen)
            n_col_c = ((min(qlen, tlen, wj + 1) + 15) // 16 + 1) * 16
            nrows = qlen + tlen - 1
            st_j = geom["st"][:, j]
            en_j = geom["en"][:, j]
            flat = _p_flat_c_layout(p_h[j // SUBL, :, j % SUBL, :],
                                    geom["base"][j // SUBL], st_j,
                                    en_j, nrows, n_col_c)
            bt = functools.partial(K._backtrack_rot, flat, list(st_j),
                                   list(en_j), n_col_c)
            if not res.zdropped and not (flag & K.KSW_EZ_EXTZ_ONLY):
                res.cigar = bt(tlen - 1, qlen - 1, rev)
            elif (not res.zdropped and (flag & K.KSW_EZ_EXTZ_ONLY)
                    and res.mqe + job["end_bonus"] > res.max):
                res.reach_end = 1
                res.cigar = bt(res.mqe_t, qlen - 1, rev)
            elif res.max_t >= 0 and res.max_q >= 0:
                res.cigar = bt(res.max_t, res.max_q, rev)
        return lambda: out
    return collect_ez


def exts2_batch(jobs, mat, q, e, q2, noncan, interpret=False,
                quantize=False, backtrack="host"):
    """Device-batched ksw_exts2 (synchronous driver of the staged form)."""
    return exts2_batch_async(jobs, mat, q, e, q2, noncan, interpret=interpret,
                             quantize=quantize, backtrack=backtrack)()()


def exts2_batch_async(jobs, mat, q, e, q2, noncan, interpret=False,
                      quantize=False, backtrack="host"):
    """Device-batched splice extension (ksw_exts2): same per-job semantics
    as ksw2_splice.exts2. jobs: list of dicts(qseq, tseq, zdrop, flag);
    band is the full min(qlen, tlen) (the reference kernel is unbanded).
    Same three-stage dispatch/collect protocol as extd2_batch_async."""
    from .ksw2_splice import make_donor_acceptor

    jobs = [dict(job, w=-1) for job in jobs]   # unbanded

    geom = plan_batch(jobs, q, e, q2, 0, splice=True)
    geom["rmax"] = max(geom["rmax"], 2 * LANES)   # on-chip walker stripe min
    geom["qoff"] = geom["rmax"]
    long_thres = (q2 - q) // e - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * e - (q2 - q)

    n = len(jobs)
    R = (n + SUBL - 1) // SUBL * SUBL
    if quantize:
        R = _pow2_at_least(R, SUBL)
    if quantize:
        _quantize_geom(geom)
    tws, qoff, rmax, ncol = geom["tws"], geom["qoff"], geom["rmax"], \
        geom["ncol"]
    sf = np.zeros((R, tws), dtype=np.int8)
    qr = np.zeros((R, qoff + tws + LANES), dtype=np.int8)
    dac = np.zeros((R, tws), dtype=np.int16)
    meta = np.zeros((R, LANES), dtype=np.int32)
    meta[:, M_QLEN] = 1
    meta[:, M_SCONLY] = 1  # padded rows never walk
    for j, job in enumerate(jobs):
        qs, ts = job["qseq"], job["tseq"]
        sf[j, :len(ts)] = ts
        qr[j, qoff - (len(qs) - 1):qoff + 1] = qs[::-1].astype(np.int8)
        donor, acceptor = make_donor_acceptor(ts, noncan, job["flag"])
        dac[j, :len(donor)] = ((donor.astype(np.int16) & 0xFF)
                               | ((acceptor.astype(np.int16) & 0xFF) << 8))
        meta[j, M_QLEN] = len(qs)
        meta[j, M_TLEN] = len(ts)
        meta[j, M_W] = max(len(qs), len(ts))
        meta[j, M_ZDROP] = job["zdrop"]
        flag = job["flag"]
        meta[j, M_RIGHT] = 1 if flag & K.KSW_EZ_RIGHT else 0
        meta[j, M_APPROX] = 1 if flag & K.KSW_EZ_APPROX_MAX else 0
        meta[j, M_ADROP] = 1 if flag & K.KSW_EZ_APPROX_DROP else 0
        meta[j, M_EXTZ] = 1 if flag & K.KSW_EZ_EXTZ_ONLY else 0
        meta[j, M_SCONLY] = 1 if flag & K.KSW_EZ_SCORE_ONLY else 0

    walk = backtrack == "device"
    res_call = _ksw_call(
        jnp.asarray(sf), jnp.asarray(qr), jnp.asarray(dac),
        jnp.asarray(meta), q=q, e=e, q2=q2, e2=0, mat0=int(mat[0]),
        sc_mis=int(np.int8(mat[1])), sc_n=-e,
        long_thres=int(long_thres), long_diff=int(long_diff),
        tws=tws, qoff=qoff, rmax=rmax, ncol=ncol, splice=True, walk=walk,
        interpret=interpret)

    def collect_ez():
        if walk:
            _, ez, ops = res_call
            ez_h = np.asarray(ez)
            ops_h = np.asarray(ops)
            out = [_ez_from_row(ez_h[j]) for j in range(len(jobs))]
            _decode_walk(jobs, out, ez_h, ops_h, splice=True,
                         long_thres=int(long_thres))
            return lambda: out
        p, ez = res_call
        ez_h = np.asarray(ez)
        out = [_ez_from_row(ez_h[j]) for j in range(len(jobs))]
        p_h = None
        if any(not (job["flag"] & K.KSW_EZ_SCORE_ONLY) for job in jobs):
            p_h = np.asarray(p)   # big: only pull when a cigar is needed
        for j, (job, res) in enumerate(zip(jobs, out)):
            flag = job["flag"]
            qlen, tlen = len(job["qseq"]), len(job["tseq"])
            if flag & K.KSW_EZ_SCORE_ONLY:
                continue
            rev = bool(flag & K.KSW_EZ_REV_CIGAR)
            # splice C p stride (ksw2_exts2_sse.c:96)
            n_col_c = (min(qlen, tlen) + 15) // 16 * 16 + 16
            nrows = qlen + tlen - 1
            st_j = geom["st"][:, j]
            en_j = geom["en"][:, j]
            flat = _p_flat_c_layout(p_h[j // SUBL, :, j % SUBL, :],
                                    geom["base"][j // SUBL], st_j,
                                    en_j, nrows, n_col_c)
            bt = functools.partial(K._backtrack_rot, flat, list(st_j),
                                   list(en_j), n_col_c)
            # the splice kernel has no reach_end path (ksw2_exts2_sse.c tail)
            if not res.zdropped and not (flag & K.KSW_EZ_EXTZ_ONLY):
                res.cigar = bt(tlen - 1, qlen - 1, rev,
                               min_intron_len=long_thres)
            elif res.max_t >= 0 and res.max_q >= 0:
                res.cigar = bt(res.max_t, res.max_q, rev,
                               min_intron_len=long_thres)
        return lambda: out
    return collect_ez
