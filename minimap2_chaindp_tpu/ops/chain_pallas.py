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
# anchors processed per inner fori_loop iteration (must divide LANES):
# amortizes the carried-block VMEM round trip AND the per-group field-
# register rotation (r4: registers rotate by UNROLL once per group with
# static in-group column reads, instead of by 1 per anchor — that change
# moved the measured unroll saturation point from 8 to 16/32 and the
# captured rate 73.6M -> 77.0M anchors/s). Output-invariant.
import os as _os
UNROLL = int(_os.environ.get("MM2TPU_CHAIN_UNROLL", "16"))
assert LANES % UNROLL == 0
def pick_subl(max_n: int, n_blocks: int = 6) -> int:
    """Reads per grid program: as large as VMEM comfortably allows (more
    sublanes per vector op = better VPU latency hiding). n_blocks: live
    (subl, max_n) i32 blocks — 6 on the single-seg path (xhi/rpos/qpos/span
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


_D64 = None


@functools.lru_cache(maxsize=8192)
def _slope_exc_cached(avg_bits: bytes):
    global _D64
    if _D64 is None:
        _D64 = (np.arange(TBL, dtype=np.float64),
                np.arange(TBL, dtype=np.float32))
    d, df32 = _D64
    avg = np.float64(np.frombuffer(avg_bits, np.float32)[0])
    exact = (d * 0.01 * avg).astype(np.int64)  # C double semantics
    # search the f32 slope whose kernel-side trunc(f32(dd)*w) matches the
    # C double result on the most dd values; neighbors of the nearest f32
    # usually reach zero mismatches
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
        return best_w, None
    return best_w, tuple((int(dd), int(exact[dd])) for dd in bad)


def clin_slope_exc(avg_qspan_f32):
    """f32 gap-cost slope + exception pairs making the kernel's
    trunc(f32(dd) * w1) equal the C-double trunc(dd * 0.01 * avg) for every
    dd < TBL (the exactness contract in the module docstring). Returns
    (w1, ((dd, exact), ...)) or (w1, None) when more than N_EXC mismatches
    remain — such reads take the host path."""
    return _slope_exc_cached(np.float32(avg_qspan_f32).tobytes())


def _chain_kernel(nold_ref, xst_ref, rpos_ref, qpos_ref, span_ref, sid_ref,
                  nn_ref, w1_ref, exc_ref, f_ref, p_ref, flag_ref,
                  *, subl, max_n, max_dist_x, max_dist_y, bw, max_skip,
                  is_cdna, many_segs, single_seg=False, use_exc=True,
                  packed_ep=False):
    # xst: anchor-x high words (multi-seg/cdna) OR the fused window starts
    # (single-seg, where [stw, i) guarantees xh == xi and dr <= max_dist_x
    # by construction, so the per-candidate x tests vanish)
    # nold (SMEM, per grid row): number of older window chunks for anchor i
    # (host-precomputed from the stw window starts; identical for all the
    # row's reads by construction). A scalar SMEM read replaces the
    # cross-sublane max-reduce per anchor that the packed-meta design paid.
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
    # strict upper-triangular (suffix-count) matrix: one bf16 matmul per
    # chunk computes, for every lane l, the number of valid candidates at
    # lanes > l (= scanned BEFORE l on the descending within-chunk scan).
    # bf16 is exact for integer counts <= 256, and the dot rides the MXU —
    # which is otherwise idle — so the max_skip bookkeeping costs no VPU
    # reduction (the two per-chunk cross-lane reductions of the previous
    # design are gone; argmax is resolved once per anchor instead)
    _rr = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    _cc = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    suf_mat = (_rr > _cc).astype(jnp.bfloat16)
    mdy_x = min(max_dist_y, max_dist_x)
    lane2 = lane * 2
    max_skip_f = jnp.float32(max_skip)

    def score_block(xh, rp, qp, sd, fj, base, i, act_read,
                    xi, ri, qi, qs, si, state, newest=False, cf=None):
        """Score one 128-candidate chunk for anchor i (chain.c:52-90).
        `newest`: the chunk containing i itself, where j < i must be
        enforced (older chunks satisfy it by construction).

        State is PER-LANE: bsc/bj are each lane's running best score and
        its anchor index across chunks (strict > keeps the first-scanned =
        largest j, matching chain.c:62's descending scan), snap is the
        count of valid candidates scanned before that best, and tot the
        running valid count. The cross-lane argmax happens once per anchor
        in the caller, not once per chunk.

        packed_ep (static): per-lane state is ONE packed running max
          sc<<16 | cf<<8 | lane<<1 | skip_flag
        whose lexicographic order IS the reference's tie order (score,
        then first-scanned chunk = larger recency field cf, then
        first-scanned lane = larger lane), so the caller resolves argmax,
        best_j and the max_skip flag with a SINGLE cross-lane reduction.
        Requires |score| < 2^15 (host guarantees via the qlen bound) and
        cf in [0, 255] (max_n <= 255*128)."""
        if packed_ep:
            bscp, tot = state
        else:
            bsc, bj, snap, tot = state
            j = base + lane
        dr = ri - rp
        dq = qi - qp
        dd = jnp.abs(dr - dq)
        if single_seg:
            # one segment => sid==0 everywhere => `same` is identically
            # true: the whole pen_other branch and the seg-aware masks
            # fold away (~25% fewer VPU ops on the common path).  xi here
            # is the anchor's FUSED window start (see kernel docstring):
            # j >= stw implies xh == xi, dr in [0, max_dist_x], and that j
            # is a real (non-padded) anchor, so only dr != 0 and the dq/dd
            # bounds remain ((d-1) u< max <=> 1 <= d <= max). act_read is
            # enforced at the f/p/flag writes (padded i scans garbage
            # safely: its thr <= 0 candidates are all real j < i).
            valid = (lane >= (xi - base)) & (dr != 0) \
                & ((dq - 1).astype(jnp.uint32) < jnp.uint32(mdy_x)) \
                & (dd <= bw)
        else:
            same = sd == si
            valid = act_read & (xh == xi) & (dr <= max_dist_x)
            valid &= ~((same & (dr == 0)) | (dq <= 0))
            valid &= ~((same & (dq > max_dist_y)) | (dq > max_dist_x))
            valid &= ~(same & (dd > bw))
            if many_segs and not is_cdna:
                valid &= ~(same & (dr > max_dist_y))
        if newest:
            valid &= lane < (i - base)   # j < i on the newest chunk

        min_d = jnp.minimum(dq, dr)
        sc = jnp.minimum(min_d, qs)
        ddf = dd.astype(jnp.float32)
        c_lin = (ddf * w1).astype(jnp.int32)
        for dd_k, cl_k in exc:
            c_lin = jnp.where(dd == dd_k, cl_k, c_lin)
        # ilog2 via the f32 exponent; max(ddf,1) makes dd==0 land on
        # exponent 0, so no dd>0 select is needed (chain.c ilog2 LUT)
        log_dd = (jax.lax.bitcast_convert_type(
            jnp.maximum(ddf, 1.0), jnp.int32) >> 23) - 127
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
        # skip-divergence bookkeeping (conservative superset of the
        # reference's stamped non-improving count, see module docstring):
        # the count of valid candidates scanned strictly before lane l =
        # valid total of earlier chunks + within-chunk suffix count (MXU)
        vb = valid.astype(jnp.bfloat16)
        suf = jax.lax.dot_general(vb, suf_mat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if packed_ep:
            # (suf > max_skip - tot) == (tot + suf > max_skip) with the
            # threshold shifted on the narrow (SUBL,1) side — one fewer
            # full-width op; likewise (lane2 + cf*256) groups the two
            # lane-constant terms (constant-folded on the newest chunk,
            # where cf is a Python int)
            thr = max_skip_f - tot
            fl = (suf > thr).astype(jnp.int32)
            scp = sc * 65536 + (lane2 + cf * 256) + fl
            bscp = jnp.maximum(bscp, jnp.where(valid, scp, NEG_INF))
            tot = tot + (suf[:, 0:1] + vb[:, 0:1].astype(jnp.float32))
            return (bscp, tot)
        scv = jnp.where(valid, sc, NEG_INF)
        imp = scv > bsc
        snap = jnp.where(imp, tot + suf, snap)
        tot = tot + (suf[:, 0:1] + vb[:, 0:1].astype(jnp.float32))
        bsc = jnp.maximum(bsc, scv)
        bj = jnp.where(imp, j, bj)
        return (bsc, bj, snap, tot)

    def ic_body(ic, flags):
        # process anchors one i-chunk at a time: the chunk's fields and its
        # f/p stay in carried registers, so per-anchor VMEM traffic is only
        # the *older* window chunks (the newest chunk and the f/p update are
        # register operations, stored once per 128 anchors)
        base_i = ic * LANES
        isl = pl.ds(base_i, LANES)
        xb = xst_ref[:, isl]
        rb = rpos_ref[:, isl]
        qb = qpos_ref[:, isl]
        mb = span_ref[:, isl]
        sib = None if single_seg else sid_ref[:, isl]

        def inner(off, k, carry):
            # per-anchor fields come from carried registers rotated by a
            # CONSTANT UNROLL once per unroll GROUP (cheaper than a dynamic
            # roll by LANES-off, and UNROLL× cheaper than the r3 design's
            # rotate-by-1 per anchor): within the group, anchor k's column
            # sits at static lane k
            fb, pb, xr, rr, qr, mr, sr, flags = carry
            i = base_i + off
            xi = xr[:, k:k + 1]
            ri = rr[:, k:k + 1]
            qi = qr[:, k:k + 1]
            qs = mr[:, k:k + 1]
            si = None if single_seg else sr[:, k:k + 1]
            act_read = (i < n_vec)

            # host-precomputed older-window-chunk count (from the sliding
            # st of chain.c:58, reduced over the grid row's reads): one
            # scalar SMEM read per anchor
            n_old = nold_ref[0, 0, i]

            if packed_ep:
                state0 = (jnp.full((SUBL, LANES), NEG_INF, jnp.int32),
                          jnp.zeros((SUBL, 1), jnp.float32))
            else:
                state0 = (jnp.full((SUBL, LANES), NEG_INF, jnp.int32),
                          jnp.full((SUBL, LANES), -1, jnp.int32),
                          jnp.zeros((SUBL, LANES), jnp.float32),
                          jnp.zeros((SUBL, 1), jnp.float32))
            state1 = score_block(xb, rb, qb, sib, fb, base_i, i, act_read,
                                 xi, ri, qi, qs, si, state0, newest=True,
                                 cf=255)

            def old_chunk(c, state):
                base = (ic - 1 - c) * LANES
                sl = pl.ds(base, LANES)
                return score_block(None if single_seg else xst_ref[:, sl],
                                   rpos_ref[:, sl],
                                   qpos_ref[:, sl],
                                   None if single_seg else sid_ref[:, sl],
                                   f_ref[:, sl], base, i, act_read,
                                   xi, ri, qi, qs, si, state, cf=254 - c)

            if packed_ep:
                # ONE cross-lane reduction resolves max score, argmax j and
                # the skip flag together (packed tie order == chain.c:62's
                # descending-scan first-wins rule; see score_block)
                (bscp, _) = jax.lax.fori_loop(0, n_old, old_chunk, state1)
                m2 = jnp.max(bscp, axis=1, keepdims=True)
                cur_max = m2 >> 16
                cfw = (m2 >> 8) & 255
                best_j = (cfw + (ic - 255)) * LANES + ((m2 >> 1) & 127)
                skip_fl = (m2 & 1) == 1
            else:
                bsc, bj, snap, _ = jax.lax.fori_loop(0, n_old, old_chunk,
                                                     state1)
                # cross-lane argmax, once per anchor: the max score, then
                # among lanes tied at the max the LARGEST bj (= first
                # scanned on the global descending j order, chain.c:62).
                # bj and the clamped skip count pack into one key (bj <
                # 2^16 asserted host-side, snap clamped to 2^15-1 — the
                # clamp preserves the flag test since max_skip << 32767),
                # so the tie-break and the count extraction share the
                # second reduction.
                cur_max = jnp.max(bsc, axis=1, keepdims=True)
                snap_i = jnp.minimum(snap, 32767.0).astype(jnp.int32)
                r = jnp.max(jnp.where(bsc == cur_max,
                                      bj * 32768 + snap_i, -1),
                            axis=1, keepdims=True)
                best_j = r >> 15
                skip_fl = (r & 32767) > max_skip
            max_f = jnp.maximum(cur_max, qs)
            have = cur_max > qs
            p_new = jnp.where(have & act_read, best_j, -1)
            f_new = jnp.where(act_read, max_f, 0)
            fb = jnp.where(lane == off, f_new, fb)
            pb = jnp.where(lane == off, p_new, pb)
            skip_bad = have & skip_fl & act_read
            return (fb, pb, xr, rr, qr, mr, sr,
                    flags | jnp.where(skip_bad, 1, 0))

        fb0 = jnp.zeros((SUBL, LANES), jnp.int32)
        pb0 = jnp.full((SUBL, LANES), -1, jnp.int32)

        # unrolled anchor loop: the carry holds ~8 (SUBL, LANES) blocks,
        # which exceed the vector register file — every fori_loop
        # iteration round-trips them through VMEM. Window-size ablation
        # (PERF.md r3 roofline) measured that carry traffic as ~75% of
        # kernel time (~90 ms of 121 ms fixed vs window-linear work), so
        # processing UNROLL anchors per iteration divides the dominant
        # cost by UNROLL while leaving per-anchor math unchanged.
        def inner_u(u, carry):
            for k in range(UNROLL):
                carry = inner(u * UNROLL + k, k, carry)
            fb, pb, xr, rr, qr, mr, sr, flags = carry
            rotu = lambda t: pltpu.roll(t, LANES - UNROLL, 1)
            return (fb, pb, rotu(xr), rotu(rr), rotu(qr), rotu(mr),
                    sr if single_seg else rotu(sr), flags)

        fb, pb, *_, flags = jax.lax.fori_loop(
            0, LANES // UNROLL, inner_u,
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
                       many_segs, interpret=False, use_exc=None,
                       score_bound=None):
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
    # packed single-reduction epilogue: eligible when every read's chain
    # scores provably fit 15 bits (score telescopes over query coverage, so
    # qlen_sum bounds it; callers pass qlen_sum [*2 for cdna's +1 bonus] +
    # margin) and the chunk recency field fits 8 bits
    packed_ep = (score_bound is not None and score_bound < 32512
                 and max_n <= 255 * LANES)
    return _chain_scores_jit(
        xhi, rpos, qpos, span, sid, stw, nn, w1, exc, max_n=max_n,
        max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
        max_skip=max_skip, is_cdna=is_cdna, many_segs=many_segs,
        interpret=interpret, use_exc=bool(use_exc), packed_ep=packed_ep)


@functools.partial(jax.jit, static_argnames=(
    "max_n", "max_dist_x", "max_dist_y", "bw", "max_skip", "is_cdna",
    "many_segs", "interpret", "use_exc", "packed_ep"))
def _chain_scores_jit(xhi, rpos, qpos, span, sid, stw, nn, w1, exc, *,
                      max_n, max_dist_x, max_dist_y, bw, max_skip, is_cdna,
                      many_segs, interpret, use_exc, packed_ep):
    # exact-c_lin domain: pen_same's dd is bounded by the same-seg band
    # (dd <= bw) in genomic mode, and by dq <= max_dist_y in cdna mode
    # (chain.c:65-78); beyond TBL only the log penalty survives the min
    assert (max_dist_y if is_cdna else bw) < TBL, \
        "same-seg gap-cost domain >= TBL uses the host/XLA path"
    R = xhi.shape[0]
    assert max_n <= 1 << 16, "bj/snap epilogue packing needs max_n <= 65536"
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
    # XLA prelude: nold[g, i] = i//128 - min_r(st[r,i]//128) is the
    # per-grid-row count of older window chunks (padded reads contribute
    # their own chunk, i.e. nothing); shipped to the kernel through SMEM
    ici = jnp.arange(max_n, dtype=jnp.int32) // LANES
    fc = jnp.where(jnp.arange(max_n, dtype=jnp.int32) < nn[:, 0:1],
                   stw // LANES, ici)
    nold = ici - fc.reshape(R // SUBL, SUBL, max_n).min(axis=1)
    kern = functools.partial(
        _chain_kernel, subl=SUBL, max_n=max_n, max_dist_x=max_dist_x,
        max_dist_y=max_dist_y, bw=bw, max_skip=max_skip, is_cdna=is_cdna,
        many_segs=many_segs, single_seg=single_seg, use_exc=use_exc,
        packed_ep=packed_ep)
    blk = lambda w: pl.BlockSpec((SUBL, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    sid_blk = blk(LANES) if single_seg else blk(max_n)
    nold = nold[:, None, :]   # (G, 1, max_n): unit axis satisfies the
    # TPU block rule (last two block dims must equal the array dims)
    nold_blk = pl.BlockSpec((1, 1, max_n), lambda g: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    # single-seg: the kernel needs the fused per-anchor window starts, not
    # the x high words (the stw semantics subsume the x tests; see kernel)
    xst = stw if single_seg else xhi
    f, p, flag = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[nold_blk] + [blk(max_n)] * 4 + [sid_blk]
                 + [blk(LANES), blk(LANES), blk(LANES)],
        out_specs=(blk(max_n), blk(max_n), blk(LANES)),
        out_shape=(jax.ShapeDtypeStruct((R, max_n), jnp.int32),
                   jax.ShapeDtypeStruct((R, max_n), jnp.int32),
                   jax.ShapeDtypeStruct((R, LANES), jnp.int32)),
        interpret=interpret,
    )(nold, xst, rpos, qpos, span, sid, nn, w1, exc)
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
    for r, rd in enumerate(reads):
        n = len(rd["rpos"])
        for k in ("xhi", "rpos", "qpos", "span", "sid"):
            out[k][r, :n] = rd[k]
        nn[r, 0] = n
        if n == 0:
            continue
        # window start: first j with x[j] >= x[i] - max_dist_x on the
        # reconstructed unsigned 64-bit a[].x sort key (chain.c:58), FUSED
        # with the first same-xhi index: within [stw, i) every candidate
        # then has xh == xi AND dr <= max_dist_x by construction, so the
        # single-seg kernel tests only j >= stw (and windows stop at
        # strand/rid boundaries instead of scanning cross-strand chunks)
        key = ((rd["xhi"].astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)
               << np.uint64(32)) | rd["rpos"].astype(np.uint64)
        dd = np.uint64(max_dist_x)
        target = np.where(key >= dd, key - dd, np.uint64(0))
        sx = np.searchsorted(key, key & ~np.uint64(0xFFFFFFFF), side="left")
        out["stw"][r, :n] = np.maximum(
            np.searchsorted(key, target, side="left"), sx).astype(np.int32)
        avg = np.float32(rd["avg_qspan"])
        assert avg >= 1.6, "tiny avg_qspan breaks the c_log shortcut"
        best_w, excl = clin_slope_exc(avg)
        if excl is None:
            host_flag[r] = True
            continue
        w1[r, 0] = best_w
        for k, (dd, val) in enumerate(excl):
            exc[r, 2 * k] = dd
            exc[r, 2 * k + 1] = val
    return out, nn, w1, exc, host_flag
