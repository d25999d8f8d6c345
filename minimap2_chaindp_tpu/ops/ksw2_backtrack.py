"""On-chip CIGAR backtrack for the ksw2 Pallas kernels.

Shipping the full backtrack-byte matrix p to the host costs O(rows × band)
bytes per job — the dominant cost on transfer-limited links.  This kernel
walks the backtrack state machine (ksw_backtrack, ksw2.h:119-151) ON the
TPU, reading p in row stripes DMA'd HBM→VMEM on demand, and ships only
O(rows) step codes per job (~band× less traffic).

The walk reads p through the C kernel's FLAT layout semantics (row stride
n_col with row-tail spill aliasing, see ops/ksw2_pallas._p_flat_c_layout):
for flat position q = rr*n_col + kk the surviving byte is row rr's device
column st(rr)-base(rr)+kk when kk < width(rr), else row rr-1's spill at
kk+n_col, else calloc 0 — all reconstructed from the closed-form band
geometry, so nothing but the step codes crosses the link.

Per step the kernel emits the chosen state (0=M, 1=E-gap, 2=F-gap,
3=second/intron gap); the host run-length encodes and applies the
reverse/min-intron conventions.  Validated against the host backtrack on
identical p bytes (tests/test_ksw2_backtrack.py)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ksw2 as K
from .ksw2_pallas import LANES, SUBL, _band

STRIPE = 56          # p rows per DMA stripe
MARGIN = 8           # margin rows above for the walk, below for rr-1 alias
SROWS = STRIPE + 2 * MARGIN

# bt-meta columns
B_QLEN, B_TLEN, B_W, B_I0, B_J0, B_NCOLC, B_ACTIVE = range(7)


def _bt_kernel(meta_ref, base_ref, p_any, ops_ref, fin_ref, stripe, sem, *,
               rmax, ncol, opcap, splice):
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    oplane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    g = pl.program_id(0)
    row_max = max(rmax - SROWS, 0)

    # group band minimum (the forward kernel's chunk base): precomputed on
    # the host (plan_batch's base image) — an SMEM row lookup instead of
    # SUBL closed-form band evaluations per access
    def base_of(r):
        return base_ref[0, 0, r]

    for s in range(SUBL):
        qlen = meta_ref[s, B_QLEN]
        tlen = meta_ref[s, B_TLEN]
        wj = meta_ref[s, B_W]
        ncolc = meta_ref[s, B_NCOLC]
        active = meta_ref[s, B_ACTIVE]
        i0 = meta_ref[s, B_I0]
        j0 = meta_ref[s, B_J0]

        def band(r):
            _, _, st, en = _band(r, qlen, tlen, wj, splice)
            return st, en

        def fetch_stripe(row_lo):
            # HBM slices must stay tile-aligned on the sublane dim, so the
            # stripe carries all 8 jobs' rows; s is selected statically
            cp = pltpu.make_async_copy(
                p_any.at[g, pl.ds(row_lo, SROWS), :, :], stripe, sem)
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
            # refill so rows [r-1, r+1] sit inside the stripe (the spill
            # alias can point one row above, the rr-1 source one below)
            need = (r - 1 < row_lo) | (r + 1 >= row_lo + SROWS)
            new_lo = jnp.clip(r - STRIPE, 0, row_max)

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
            # chunked op staging: lane k%LANES of a register buffer, one
            # aligned (1, LANES) store per LANES steps instead of an
            # O(opcap) vector update per step
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

        @pl.when(active != 0)
        def _walk():
            lo0 = jnp.clip(i0 + j0 - STRIPE, 0, row_max)
            fetch_stripe(lo0)
            buf0 = jnp.zeros((1, LANES), jnp.int32)
            i, j, _, k, _, buf = jax.lax.while_loop(
                cond, step,
                (i0, j0, jnp.int32(0), jnp.int32(0), lo0, buf0))
            # flush the final partial chunk (lanes past k%LANES are stale
            # but lie beyond n_ops, which the host decode never reads)
            off = pl.multiple_of(k // LANES * LANES, LANES)

            @pl.when(k % LANES != 0)
            def _():
                ops_ref[s:s + 1, pl.ds(off, LANES)] = buf
            fin_ref[s, 0] = i
            fin_ref[s, 1] = j
            fin_ref[s, 2] = k


@functools.partial(jax.jit, static_argnames=("rmax", "ncol", "opcap",
                                             "splice", "interpret"))
def _bt_call(p, meta, base, *, rmax, ncol, opcap, splice, interpret=False):
    G = p.shape[0]
    kern = functools.partial(_bt_kernel, rmax=rmax, ncol=ncol, opcap=opcap,
                             splice=splice)
    if interpret:
        interpret = pltpu.InterpretParams()
    ops, fin = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((SUBL, LANES), lambda gg: (gg, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rmax), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((SUBL, opcap), lambda gg: (gg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBL, LANES), lambda gg: (gg, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G * SUBL, opcap), jnp.int32),
            jax.ShapeDtypeStruct((G * SUBL, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SROWS, SUBL, ncol), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, base, p)
    return ops, fin


def device_backtrack(p_dev, jobs, ezs, geom, *, splice, long_thres,
                     interpret=False):
    """Decode all jobs' CIGARs with the on-chip walker (synchronous)."""
    fin = device_backtrack_dispatch(p_dev, jobs, ezs, geom, splice=splice,
                                    long_thres=long_thres,
                                    interpret=interpret)
    if fin is not None:
        fin()


def device_backtrack_dispatch(p_dev, jobs, ezs, geom, *, splice, long_thres,
                              interpret=False):
    """Dispatch the on-chip walker for all cigar-bearing jobs and return a
    collector closure that blocks on the step codes and run-length-encodes
    them into each ez.cigar; returns None when no job needs a walk.
    p_dev: the forward kernel's p output, still on device.
    ezs: host K.Ez results (scores already filled). Mutated in place."""
    rmax, ncol = geom["rmax"], geom["ncol"]
    R = p_dev.shape[0] * SUBL
    opcap = (rmax + 2 + LANES - 1) // LANES * LANES
    meta = np.zeros((R, LANES), dtype=np.int32)
    plan = []  # (job idx, is_rev, min_intron)
    for j, (job, ez) in enumerate(zip(jobs, ezs)):
        flag = job["flag"]
        if flag & K.KSW_EZ_SCORE_ONLY:
            continue
        qlen, tlen = len(job["qseq"]), len(job["tseq"])
        if splice:
            ncolc = (min(qlen, tlen) + 15) // 16 * 16 + 16
        else:
            wj = job["w"] if job["w"] >= 0 else max(qlen, tlen)
            ncolc = ((min(qlen, tlen, wj + 1) + 15) // 16 + 1) * 16
        if not splice and not ez.zdropped and (flag & K.KSW_EZ_EXTZ_ONLY) \
                and ez.mqe + job["end_bonus"] > ez.max:
            ez.reach_end = 1
            i0, j0 = ez.mqe_t, qlen - 1
        elif not ez.zdropped and not (flag & K.KSW_EZ_EXTZ_ONLY):
            i0, j0 = tlen - 1, qlen - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0, j0 = ez.max_t, ez.max_q
        else:
            continue
        meta[j, B_QLEN] = qlen
        meta[j, B_TLEN] = tlen
        meta[j, B_W] = job["w"] if job["w"] >= 0 else max(qlen, tlen)
        meta[j, B_I0] = i0
        meta[j, B_J0] = j0
        meta[j, B_NCOLC] = ncolc
        meta[j, B_ACTIVE] = 1
        plan.append((j, bool(flag & K.KSW_EZ_REV_CIGAR),
                     long_thres if splice else 0))
    if not plan:
        return None
    # padded rows must mirror the forward batch so base_of() matches: copy
    # qlen/tlen/w for INACTIVE real jobs too
    for j, job in enumerate(jobs):
        if meta[j, B_QLEN] == 0:
            meta[j, B_QLEN] = len(job["qseq"])
            meta[j, B_TLEN] = len(job["tseq"])
            meta[j, B_W] = job["w"] if job["w"] >= 0 else \
                max(len(job["qseq"]), len(job["tseq"]))
    for j in range(len(jobs), R):
        meta[j, B_QLEN] = 1   # matches the forward kernel's padded rows

    # the forward kernel's per-row chunk base, padded to the (quantized)
    # kernel geometry: (G, rmax) image for the SMEM row lookup
    G = p_dev.shape[0]
    base0 = geom["base"]
    bimg = np.zeros((G, 1, rmax), dtype=np.int32)
    bimg[:base0.shape[0], 0, :base0.shape[1]] = base0

    import jax.numpy as jnp2
    ops, fin = _bt_call(p_dev, jnp2.asarray(meta), jnp2.asarray(bimg),
                        rmax=rmax, ncol=ncol,
                        opcap=opcap, splice=splice, interpret=interpret)

    def collect():
        ops_h = np.asarray(ops)
        fin_h = np.asarray(fin)
        for j, rev, mintr in plan:
            ezs[j].cigar = decode_cigar(ops_h[j], int(fin_h[j, 2]),
                                        int(fin_h[j, 0]), int(fin_h[j, 1]),
                                        rev, mintr)
    return collect


def decode_cigar(ops, n_ops, fin_i, fin_j, is_rev, min_intron_len=0):
    """Run-length encode the device step codes into a CIGAR
    (tail + reverse conventions of ksw_backtrack, ksw2.h:137-150);
    vectorized — the walks are thousands of steps per job."""
    from .ksw2 import _push_cigar
    cigar: list[int] = []
    if n_ops:
        st = ops[:n_ops].astype(np.int64)
        op = np.where(st == 0, 0,
                      np.where(st == 2, 1,
                               np.where(st == 1, 2,
                                        3 if min_intron_len > 0 else 2)))
        cut = np.nonzero(np.diff(op))[0] + 1
        starts = np.concatenate([[0], cut])
        ends = np.concatenate([cut, [n_ops]])
        cigar = list(((ends - starts) << 4 | op[starts]).astype(np.int64))
        cigar = [int(v) for v in cigar]
    if fin_i >= 0:
        _push_cigar(cigar, 3 if (min_intron_len > 0
                                 and fin_i >= min_intron_len) else 2,
                    fin_i + 1)
    if fin_j >= 0:
        _push_cigar(cigar, 1, fin_j + 1)
    if not is_rev:
        cigar.reverse()
    return cigar
