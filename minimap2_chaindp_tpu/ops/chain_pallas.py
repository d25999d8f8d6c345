"""Pallas TPU kernel for the chaining-DP score pass — the centerpiece op.

This is the TPU-native replacement for the reference's FPGA chaining offload
(fpga_chaindp.c / chain.c mm_chain_dp_fpga). Design (see SURVEY.md §7.5):

  * reads are batched 8 per grid program (the VPU sublane dimension); each
    program runs the sequential anchor loop for its 8 reads in lockstep
  * the predecessor window is scanned in 128-lane chunks aligned to the anchor
    array, descending from anchor i, until every read's distance window is
    exhausted — the full window is scanned (vector lanes make the reference's
    max_skip early-break pointless as a speed trick)
  * gap cost c_lin = trunc(dd * .01 * avg_qspan) is EXACT: the kernel computes
    a float32 candidate trunc(f32(dd) * w1); the host verifies that candidate
    against the C-double-exact value for EVERY dd < TBL and ships the (rare)
    mismatches as an explicit exception list the kernel patches by equality
    compare — reads with too many exceptions fall back to the host. Beyond
    the table c_lin provably exceeds c_log so min(c_lin, c_log) = c_log
  * max_skip semantics: a read is FLAGGED when some iteration scans more than
    max_skip valid non-improving candidates before its argmax — only then can
    the reference's stamp-driven early break change f/p (see ops/chain_jax.py)
  * flagged reads are recomputed exactly on the host (the reference's own
    err_flag software-fallback pattern, map.c:933-944)

Outputs per read: f[], p[] (int32) and a flag; v[] and the compact offload
arrays are reconstructed on the host (O(n) bookkeeping).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0x40000000
LANES = 128
def pick_subl(max_n: int, n_blocks: int = 6) -> int:
    """Reads per grid program: as large as VMEM comfortably allows (more
    sublanes per vector op = better VPU latency hiding). n_blocks: live
    (subl, max_n) i32 blocks — 6 on the single-seg path (xhi/rpos/qpos/meta
    in, f/p out), 7 with the full-width sid block (multi-seg / cdna)."""
    import os
    if "MM2TPU_SUBL" in os.environ:
        return int(os.environ["MM2TPU_SUBL"])
    # blocks are DOUBLE-BUFFERED by the pipeline; budget the single-buffered
    # total so 2x it plus LANES-wide blocks and carried registers stays
    # under the 16 MiB scoped-vmem limit (6 MiB for the 7-block variant
    # keeps the multi-seg path at its validated SUBL=128 @ max_n=1024)
    budget = (7 if n_blocks <= 6 else 6) * 1024 * 1024
    subl = budget // (max_n * 4 * n_blocks)
    # power of two only: the caller halves SUBL until it divides the padded
    # read count (a multiple of 8), and Mosaic requires block dim -2 >= 8 —
    # a non-pow2 start (e.g. 72) can halve through 9 -> 4 and fail lowering
    pow2 = 8
    while pow2 * 2 <= min(256, subl):
        pow2 *= 2
    return pow2
TBL = 2048    # c_lin exactness domain; requires bw < TBL
N_EXC = 2     # c_lin exception slots per read (slope search removes most)


def infer_use_exc(exc: np.ndarray) -> bool:
    """Whether any read in a host-side exc array uses an exception slot."""
    return bool((exc[:, 0:2 * N_EXC:2] >= 0).any())


def _chain_kernel(xhi_ref, rpos_ref, qpos_ref, meta_ref, sid_ref,
                  nn_ref, w1_ref, exc_ref, f_ref, p_ref, flag_ref,
                  *, subl, max_n, max_dist_x, max_dist_y, bw, max_skip,
                  is_cdna, many_segs, single_seg=False, use_exc=True):
    # meta packs nold<<16 | q_span: nold = number of older window chunks
    # for anchor i (host-precomputed per grid row from the stw window
    # starts), q_span <= 255 (sketch encoding) — one roll extracts both
    SUBL = subl
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
    n_vec = nn_ref[:, 0:1]          # (8,1) per-read anchor counts
    w1 = w1_ref[:, 0:1]             # (8,1) f32: f32(0.01 * avg_qspan)
    # exception slots: exc[:, 2k] = dd, exc[:, 2k+1] = exact c_lin; the
    # host dispatches the no-exception variant when the slope search left
    # every read's list empty (the common case)
    exc = [(exc_ref[:, 2 * k:2 * k + 1], exc_ref[:, 2 * k + 1:2 * k + 2])
           for k in range(N_EXC)] if use_exc else []
    f_ref[:, :] = jnp.zeros((SUBL, max_n), jnp.int32)
    p_ref[:, :] = jnp.full((SUBL, max_n), -1, jnp.int32)
    max_i = jnp.max(n_vec)
    zero8 = jnp.zeros((SUBL, 1), jnp.int32)

    def score_block(xh, rp, qp, sd, fj, base, i, act_read,
                    xi, ri, qi, qs, si, state, newest=False):
        """Score one 128-candidate chunk for anchor i (chain.c:52-90).
        `newest`: the chunk containing i itself, where j < i must be
        enforced (older chunks satisfy it by construction)."""
        cur_pmax, best_j, cnt_best, val_tot = state
        j = base + lane
        dr = ri - rp
        dq = qi - qp
        dd = jnp.abs(dr - dq)
        if single_seg:
            # one segment => sid==0 everywhere => `same` is identically
            # true: the whole pen_other branch and the seg-aware masks
            # fold away (~25% fewer VPU ops on the common path).  act_read
            # is also implied: a padded anchor i has xi=-1 which no real
            # candidate matches, and padded candidates have rpos=qpos=0 so
            # dr==0/dq<=0 mask them (pack_reads padding invariants)
            valid = (xh == xi) & (dr <= max_dist_x)
            valid &= ~((dr == 0) | (dq <= 0))
            valid &= ~(dq > min(max_dist_y, max_dist_x))
            valid &= ~(dd > bw)
        else:
            same = sd == si
            valid = act_read & (xh == xi) & (dr <= max_dist_x)
            valid &= ~((same & (dr == 0)) | (dq <= 0))
            valid &= ~((same & (dq > max_dist_y)) | (dq > max_dist_x))
            valid &= ~(same & (dd > bw))
            if many_segs and not is_cdna:
                valid &= ~(same & (dr > max_dist_y))
        if newest:
            valid &= j < i

        min_d = jnp.minimum(dq, dr)
        sc = jnp.minimum(min_d, qs)
        c_lin = (dd.astype(jnp.float32) * w1).astype(jnp.int32)
        for dd_k, cl_k in exc:
            c_lin = jnp.where(dd == dd_k, cl_k, c_lin)
        # ilog2 via the f32 exponent; max(dd,1) makes dd==0 land on
        # exponent 0, so no dd>0 select is needed (chain.c ilog2 LUT)
        log_dd = (jax.lax.bitcast_convert_type(
            jnp.maximum(dd, 1).astype(jnp.float32), jnp.int32) >> 23) - 127
        pen_same = c_lin + (log_dd >> 1)  # same-seg dd <= bw < TBL
        if single_seg:
            sc = sc - pen_same
        else:
            # beyond the table c_lin >= 0.01*avg*TBL > 31 >= any c_log
            # (requires avg_qspan >= 1.6, asserted host-side)
            pen_other = jnp.where(dd >= TBL, log_dd,
                                  jnp.minimum(c_lin, log_dd))
            if is_cdna:
                sc = jnp.where(~same & (dr == 0), sc + 1,
                               jnp.where((dr > dq) | ~same, sc - pen_other,
                                         sc - pen_same))
            else:
                sc = jnp.where(same, sc - pen_same,
                               jnp.where(dr == 0, sc + 1, sc - pen_other))
        sc = sc + fj
        # pack (score, lane) so max+argmax is ONE reduction; ties pick the
        # larger lane = first-scanned j on a descending scan (chain.c:62)
        pmax = jnp.max(jnp.where(valid, sc * 256 + lane, NEG_INF),
                       axis=1, keepdims=True)
        new_best = (pmax >> 8) > (cur_pmax >> 8)
        best_lane = pmax & 255
        # one fused count: valid candidates (low bits) and valid candidates
        # scanned before this chunk's best (high bits)
        cnt2 = jnp.sum(jnp.where(valid, 1, 0)
                       + jnp.where(valid & (lane > best_lane), 4096, 0),
                       axis=1, keepdims=True)
        # conservative skip-divergence bound: ALL valid candidates scanned
        # before the argmax (a superset of the reference's stamped
        # non-improving count, so flagging stays sound)
        cnt_best = jnp.where(new_best, val_tot + (cnt2 >> 12), cnt_best)
        best_j = jnp.where(new_best, base + best_lane, best_j)
        val_tot = val_tot + (cnt2 & 0xFFF)
        cur_pmax = jnp.maximum(cur_pmax, pmax)
        return (cur_pmax, best_j, cnt_best, val_tot)

    def ic_body(ic, flags):
        # process anchors one i-chunk at a time: the chunk's fields and its
        # f/p stay in carried registers, so per-anchor VMEM traffic is only
        # the *older* window chunks (the newest chunk and the f/p update are
        # register operations, stored once per 128 anchors)
        base_i = ic * LANES
        isl = pl.ds(base_i, LANES)
        xb = xhi_ref[:, isl]
        rb = rpos_ref[:, isl]
        qb = qpos_ref[:, isl]
        mb = meta_ref[:, isl]
        sib = None if single_seg else sid_ref[:, isl]

        def inner(off, carry):
            # per-anchor fields come from carried registers rotated by a
            # CONSTANT 1 each iteration (cheaper than a dynamic roll by
            # LANES-off): column `off` of the original block sits at lane 0
            fb, pb, xr, rr, qr, mr, sr, flags = carry
            i = base_i + off
            xi = xr[:, 0:1]
            ri = rr[:, 0:1]
            qi = qr[:, 0:1]
            mi = mr[:, 0:1]
            qs = mi & 0xFFFF
            si = None if single_seg else sr[:, 0:1]
            act_read = (i < n_vec)

            # host-precomputed older-window-chunk count (from the sliding
            # st of chain.c:58, reduced over the grid row's reads): all
            # rows carry the same value, so max extracts the scalar
            n_old = jnp.max(mi) >> 16

            state0 = (qs * 256 + 255, zero8 - 1, zero8, zero8)
            state1 = score_block(xb, rb, qb, sib, fb, base_i, i, act_read,
                                 xi, ri, qi, qs, si, state0, newest=True)

            def old_chunk(c, state):
                base = (ic - 1 - c) * LANES
                sl = pl.ds(base, LANES)
                return score_block(xhi_ref[:, sl], rpos_ref[:, sl],
                                   qpos_ref[:, sl],
                                   None if single_seg else sid_ref[:, sl],
                                   f_ref[:, sl], base, i, act_read,
                                   xi, ri, qi, qs, si, state)

            cur_pmax, best_j, cnt_best, _ = \
                jax.lax.fori_loop(0, n_old, old_chunk, state1)

            cur_max = cur_pmax >> 8
            max_f = jnp.maximum(cur_max, qs)
            have = cur_max > qs
            p_new = jnp.where(have & act_read, best_j, -1)
            f_new = jnp.where(act_read, max_f, 0)
            fb = jnp.where(lane == off, f_new, fb)
            pb = jnp.where(lane == off, p_new, pb)
            skip_bad = have & (cnt_best > max_skip) & act_read
            rot1 = lambda t: pltpu.roll(t, LANES - 1, 1)
            return (fb, pb, rot1(xr), rot1(rr), rot1(qr), rot1(mr),
                    sr if single_seg else rot1(sr),
                    flags | jnp.where(skip_bad, 1, 0))

        fb0 = jnp.zeros((SUBL, LANES), jnp.int32)
        pb0 = jnp.full((SUBL, LANES), -1, jnp.int32)
        fb, pb, *_, flags = jax.lax.fori_loop(
            0, LANES, inner,
            (fb0, pb0, xb, rb, qb, mb, zero8 if single_seg else sib, flags))
        f_ref[:, isl] = fb
        p_ref[:, isl] = pb
        return flags

    n_ic = pl.cdiv(max_i, LANES)
    flags = jax.lax.fori_loop(0, n_ic, ic_body,
                              jnp.zeros((SUBL, 1), jnp.int32))
    flag_ref[:, :] = jnp.broadcast_to(flags, (SUBL, LANES))


def chain_scores_batch(xhi, rpos, qpos, span, sid, stw, nn, w1, exc, *,
                       max_n, max_dist_x, max_dist_y, bw, max_skip, is_cdna,
                       many_segs, interpret=False, use_exc=None):
    """Batched chaining score pass. Inputs (R, max_n) int32 with R % 8 == 0;
    stw: (R, max_n) precomputed max_dist_x window starts (chain.c:58);
    nn: (R, 128) counts in col 0; w1: (R, 128) f32 gap-cost slope in col 0;
    exc: (R, 128) c_lin exceptions as (dd, value) pairs in cols 0..2*N_EXC.
    Returns f, p, flag.

    use_exc: statically drops the c_lin exception patches when the host
    knows every read's list is empty (the common case — pack_reads' slope
    search usually finds a mismatch-free f32 slope); inferred from `exc`
    when it is still a host array, conservative True otherwise."""
    if use_exc is None:
        use_exc = not isinstance(exc, np.ndarray) or infer_use_exc(exc)
    return _chain_scores_jit(
        xhi, rpos, qpos, span, sid, stw, nn, w1, exc, max_n=max_n,
        max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
        max_skip=max_skip, is_cdna=is_cdna, many_segs=many_segs,
        interpret=interpret, use_exc=bool(use_exc))


@functools.partial(jax.jit, static_argnames=(
    "max_n", "max_dist_x", "max_dist_y", "bw", "max_skip", "is_cdna",
    "many_segs", "interpret", "use_exc"))
def _chain_scores_jit(xhi, rpos, qpos, span, sid, stw, nn, w1, exc, *,
                      max_n, max_dist_x, max_dist_y, bw, max_skip, is_cdna,
                      many_segs, interpret, use_exc):
    # exact-c_lin domain: pen_same's dd is bounded by the same-seg band
    # (dd <= bw) in genomic mode, and by dq <= max_dist_y in cdna mode
    # (chain.c:65-78); beyond TBL only the log penalty survives the min
    assert (max_dist_y if is_cdna else bw) < TBL, \
        "same-seg gap-cost domain >= TBL uses the host/XLA path"
    R = xhi.shape[0]
    assert max_n // LANES <= 0x7FFF, "nold overflows the meta packing"
    # one segment, genomic scoring: sid==0 everywhere, so the kernel's
    # seg-aware masks and pen_other branch compile away and the sid block
    # is never read (shrunk to one chunk to skip its DMA)
    single_seg = not is_cdna and not many_segs
    SUBL = pick_subl(max_n, 6 if single_seg else 7)
    while R % SUBL:
        SUBL //= 2
    grid = (R // SUBL,)
    if single_seg:
        sid = jax.lax.slice(sid, (0, 0), (R, LANES))
    # XLA prelude: meta = nold<<16 | q_span, where nold[i] = i//128 -
    # min_r(st[r,i]//128) is the per-grid-row count of older window
    # chunks (padded reads contribute their own chunk, i.e. nothing)
    ici = jnp.arange(max_n, dtype=jnp.int32) // LANES
    fc = jnp.where(jnp.arange(max_n, dtype=jnp.int32) < nn[:, 0:1],
                   stw // LANES, ici)
    nold = ici - fc.reshape(R // SUBL, SUBL, max_n).min(axis=1)
    meta = span | jnp.broadcast_to(
        nold[:, None, :] << 16, (R // SUBL, SUBL, max_n)).reshape(R, max_n)
    kern = functools.partial(
        _chain_kernel, subl=SUBL, max_n=max_n, max_dist_x=max_dist_x,
        max_dist_y=max_dist_y, bw=bw, max_skip=max_skip, is_cdna=is_cdna,
        many_segs=many_segs, single_seg=single_seg, use_exc=use_exc)
    blk = lambda w: pl.BlockSpec((SUBL, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    sid_blk = blk(LANES) if single_seg else blk(max_n)
    f, p, flag = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[blk(max_n)] * 4 + [sid_blk]
                 + [blk(LANES), blk(LANES), blk(LANES)],
        out_specs=(blk(max_n), blk(max_n), blk(LANES)),
        out_shape=(jax.ShapeDtypeStruct((R, max_n), jnp.int32),
                   jax.ShapeDtypeStruct((R, max_n), jnp.int32),
                   jax.ShapeDtypeStruct((R, LANES), jnp.int32)),
        interpret=interpret,
    )(xhi, rpos, qpos, meta, sid, nn, w1, exc)
    return f, p, flag


def pack_reads(reads, max_n: int, max_dist_x: int):
    """Pack per-read component dicts into (R, max_n) arrays plus per-read
    counts, f32 gap-cost slopes, exception lists, and the precomputed
    max_dist_x window starts (the reference's sliding st, chain.c:58).
    Returns (packed, nn, w1, exc, host_flag) where host_flag marks reads
    whose exception list overflowed (must take the host path)."""
    # pow2 row padding (bounded compiled-shape set), floor 8 (Mosaic's
    # minimum sublane block; chain_scores_batch halves SUBL to divide R).
    # Natural-size padding matters on the tunnel-attached link: a 24-read
    # 4096-anchor bucket ships ~3 MB at R=32 vs 12 MB at a 128 floor.
    Rp = 8
    while Rp < len(reads):
        Rp *= 2
    R = Rp
    out = {k: np.zeros((R, max_n), dtype=np.int32)
           for k in ("xhi", "rpos", "qpos", "span", "sid", "stw")}
    out["xhi"][:] = -1
    nn = np.zeros((R, LANES), dtype=np.int32)
    w1 = np.zeros((R, LANES), dtype=np.float32)
    exc = np.full((R, LANES), -1, dtype=np.int32)
    host_flag = np.zeros(R, dtype=bool)
    d = np.arange(TBL, dtype=np.float64)
    df32 = d.astype(np.float32)
    for r, rd in enumerate(reads):
        n = len(rd["rpos"])
        for k in ("xhi", "rpos", "qpos", "span", "sid"):
            out[k][r, :n] = rd[k]
        nn[r, 0] = n
        if n == 0:
            continue
        # window start: first j with x[j] >= x[i] - max_dist_x on the
        # reconstructed unsigned 64-bit a[].x sort key (chain.c:58)
        key = ((rd["xhi"].astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)
               << np.uint64(32)) | rd["rpos"].astype(np.uint64)
        dd = np.uint64(max_dist_x)
        target = np.where(key >= dd, key - dd, np.uint64(0))
        out["stw"][r, :n] = np.searchsorted(
            key, target, side="left").astype(np.int32)
        avg = np.float64(np.float32(rd["avg_qspan"]))
        assert avg >= 1.6, "tiny avg_qspan breaks the c_log shortcut"
        exact = (d * 0.01 * avg).astype(np.int64)  # C double semantics
        # search the f32 slope whose kernel-side trunc(f32(dd)*w) matches
        # the C double result on the most dd values; neighbors of the
        # nearest f32 usually reach zero mismatches
        w0 = np.float32(np.float64(0.01) * avg)
        best_w, bad = w0, None
        for w in (w0, np.nextafter(w0, np.float32(0), dtype=np.float32),
                  np.nextafter(w0, np.float32(1e9), dtype=np.float32)):
            b = np.nonzero((df32 * w).astype(np.int64) != exact)[0]
            if bad is None or len(b) < len(bad):
                best_w, bad = w, b
            if len(b) == 0:
                break
        if len(bad) > N_EXC:
            host_flag[r] = True
            continue
        w1[r, 0] = best_w
        for k, dd in enumerate(bad):
            exc[r, 2 * k] = dd
            exc[r, 2 * k + 1] = exact[dd]
    return out, nn, w1, exc, host_flag
