"""End-to-end mapping pipeline (host reference path).

Mirrors the per-read flow of reference map.c: collect minimizers -> seed hits
-> chaining DP -> gen_regs -> chain_post -> est_err -> base alignment ->
mapq -> (multi-seg split + pairing) -> SAM/PAF text.

This host path is the golden model; the device (JAX/Pallas) path plugs in at
the sketch / seed-collect / chain / extend stages (models/device_pipeline.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as C
from .. import hits as H
from ..align import align_skeleton
from ..esterr import est_err
from ..io import output as out
from ..io.fastx import SeqRecord
from ..ops.chain import chain_dp
from ..ops.seeds import collect_minimizers, collect_seed_hits


def chain_post(opt, max_chain_gap_ref, mi, qlen_sum, n_segs, qlens, regs, a):
    """reference chain_post (map.c:238-247)."""
    if not (opt.flag & C.MM_F_ALL_CHAINS):
        H.set_parent(regs, opt.mask_level, opt.a * 2 + opt.b)
        if n_segs <= 1:
            regs = H.select_sub(regs, opt.pri_ratio, mi.k * 2, opt.best_n)
        else:
            from ..pe import select_sub_multi
            regs = select_sub_multi(regs, opt.pri_ratio, 0.2, 0.7,
                                    max_chain_gap_ref, mi.k * 2, opt.best_n,
                                    n_segs, qlens)
        if not (opt.flag & (C.MM_F_SPLICE | C.MM_F_SR | C.MM_F_NO_LJOIN)):
            regs = H.join_long(regs, opt, qlen_sum, a)
    return regs


def align_regs(opt, mi, qlen, seq, regs, a):
    """reference align_regs (map.c:249-259)."""
    if not (opt.flag & C.MM_F_CIGAR):
        return regs
    regs = align_skeleton(opt, mi, qlen, seq, regs, a)
    return _align_regs_post(opt, mi, regs)


def _align_regs_post(opt, mi, regs):
    if not (opt.flag & C.MM_F_ALL_CHAINS):
        H.set_parent(regs, opt.mask_level, opt.a * 2 + opt.b)
        regs = H.select_sub(regs, opt.pri_ratio, mi.k * 2, opt.best_n)
        H.set_sam_pri(regs)
    return regs


def align_regs_gen(opt, mi, qlen, seq, regs, a):
    """Generator form of align_regs for the cross-read batch scheduler:
    yields extension-job waves (see align.align1_gen), returns final regs."""
    from ..align import align_skeleton_gen
    if not (opt.flag & C.MM_F_CIGAR):
        return regs
    regs = yield from align_skeleton_gen(opt, mi, qlen, seq, regs, a)
    return _align_regs_post(opt, mi, regs)


def compute_gap_bounds(opt, qlen_sum: int) -> tuple[int, int]:
    """max chaining gaps (reference map.c:357-366)."""
    if opt.flag & C.MM_F_SR:
        max_chain_gap_qry = max(qlen_sum, opt.max_gap)
    else:
        max_chain_gap_qry = opt.max_gap
    if opt.max_gap_ref > 0:
        max_chain_gap_ref = opt.max_gap_ref
    elif opt.max_frag_len > 0:
        max_chain_gap_ref = max(opt.max_frag_len - qlen_sum, opt.max_gap)
    else:
        max_chain_gap_ref = opt.max_gap
    return max_chain_gap_qry, max_chain_gap_ref


def map_frag(mi, opt, segs: list[SeqRecord]) -> list[list[H.Region]]:
    """Map one fragment (1..n segments). Returns per-segment region lists.

    Mirrors mm_map_frag front half (map.c:326-445) + read_result_handle back
    half (map.c:816-898)."""
    n_segs = len(segs)
    qlens = [len(s.seq) for s in segs]
    seqs = [s.seq for s in segs]
    qlen_sum = sum(qlens)
    if qlen_sum == 0 or n_segs <= 0 or n_segs > C.MM_MAX_SEG:
        return [[] for _ in segs]
    qname = segs[0].name
    hash_ = C.qname_hash(qname, qlen_sum, opt.seed)
    is_sr = bool(opt.flag & C.MM_F_SR)
    is_splice = bool(opt.flag & C.MM_F_SPLICE)
    max_chain_gap_qry, max_chain_gap_ref = compute_gap_bounds(opt, qlen_sum)

    mv = collect_minimizers(opt, mi, seqs)
    if len(mv) == 0:
        return [[] for _ in segs]
    sh = collect_seed_hits(mi, opt.flag, opt.mid_occ, mv, qname, qlen_sum)
    ch = chain_dp(max_chain_gap_ref, max_chain_gap_qry, opt.bw,
                  opt.max_chain_skip, opt.min_cnt, opt.min_chain_score,
                  is_splice, n_segs, sh.anchors)
    a, u = ch.anchors.copy(), ch.u
    regs0 = H.gen_regs(hash_, qlen_sum, u, a)
    regs0 = chain_post(opt, max_chain_gap_ref, mi, qlen_sum, n_segs, qlens, regs0, a)
    if not is_sr:
        est_err(mi, qlen_sum, regs0, a, sh.mini_pos)

    if n_segs == 1:
        regs0 = align_regs(opt, mi, qlens[0], seqs[0], regs0, a)
        H.set_mapq(regs0, opt.min_chain_score, opt.a, sh.rep_len, is_sr)
        return [regs0]
    else:
        from ..pe import seg_gen, pair
        per_seg = seg_gen(hash_, n_segs, qlens, regs0, a)
        all_regs = []
        for i, (regs_i, a_i) in enumerate(per_seg):
            H.set_parent(regs_i, opt.mask_level, opt.a * 2 + opt.b)
            regs_i = align_regs(opt, mi, qlens[i], seqs[i], regs_i, a_i)
            H.set_mapq(regs_i, opt.min_chain_score, opt.a, sh.rep_len, is_sr)
            all_regs.append(regs_i)
        if n_segs == 2 and opt.pe_ori >= 0 and (opt.flag & C.MM_F_CIGAR):
            pair(max_chain_gap_ref, opt.pe_bonus, opt.a * 2 + opt.b, opt.a,
                 qlens, all_regs)
        return all_regs


def map_fragment_output(mi, opt, segs: list[SeqRecord], rg_id: str = "") -> list[str]:
    """Map one fragment and format its output lines (reference map.c:734-752)."""
    pe_ori = opt.pe_ori
    n_segs = len(segs)
    flipped = []
    work = list(segs)
    for j in range(n_segs):
        if n_segs == 2 and ((j == 0 and (pe_ori >> 1 & 1)) or (j == 1 and (pe_ori & 1))):
            work[j] = SeqRecord(work[j].name, C.revcomp_str(work[j].seq),
                                work[j].qual[::-1] if work[j].qual else None,
                                work[j].comment)
            flipped.append(j)
    if opt.flag & C.MM_F_INDEPEND_SEG:
        regss = []
        for s in work:
            regss.extend(map_frag(mi, opt, [s]))
    else:
        regss = map_frag(mi, opt, work)
    for j in flipped:  # flip back to original read strand (map.c:620-631)
        qlen = len(work[j].seq)
        for r in regss[j]:
            r.qs, r.qe = qlen - r.qe, qlen - r.qs
            r.rev = 1 - r.rev
    lines = []
    for i, rec in enumerate(segs):
        regs = regss[i]
        for j, r in enumerate(regs):
            if (opt.flag & C.MM_F_NO_PRINT_2ND) and r.id != r.parent:
                continue
            if opt.flag & C.MM_F_OUT_SAM:
                lines.append(out.write_sam(mi, rec, i, j, n_segs, regss,
                                           opt.flag, rg_id))
            else:
                lines.append(out.write_paf(mi, rec, r, opt.flag))
        if not regs and (opt.flag & C.MM_F_OUT_SAM):
            lines.append(out.write_sam(mi, rec, i, -1, n_segs, regss,
                                       opt.flag, rg_id))
    return lines
