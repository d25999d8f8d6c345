"""Device runtime: batched TPU mapping with host epilogue.

The TPU-native analog of the reference's asynchronous FPGA offload runtime
(map.c worker_pipeline / fpga_chaindp.c queues): fragments are collected into
padded anchor batches bucketed by size, the Pallas chaining kernel scores a
whole batch in one device call, flagged reads (skip-heuristic divergence or
gap-cost exceptions overflow) are recomputed exactly on the host — the
reference's own err_flag fallback pattern (map.c:933-944) — and the per-read
epilogue (backtrack, regions, alignment, output) runs on the host.

Output is bit-identical to the host pipeline (asserted by tests)."""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as C
from .. import hits as H
from ..esterr import est_err
from ..io import output as out
from ..io.fastx import SeqRecord
from ..ops.chain import Chains, chain_backtrack, chain_dp
from ..ops.chain_jax import compact_from_fpv, split_anchors
from ..ops.seeds import collect_minimizers, collect_seed_hits
from ..utils.timers import Timers
from .pipeline import chain_post, compute_gap_bounds

BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


@dataclass
class _PendingRead:
    frag_idx: int
    anchors: np.ndarray
    sh: object
    segs: list
    qlens: list
    qlen_sum: int
    hash_: int
    gap_qry: int
    gap_ref: int


class DeviceRuntime:
    """Maps fragments in device-sized batches; output order == input order."""

    def __init__(self, mi, opt, min_batch: int = 64):
        self.mi = mi
        self.opt = opt
        self.min_batch = min_batch
        self.timers = Timers()
        import jax
        self._jax = jax
        self._interpret = jax.devices()[0].platform == "cpu"
        from .batch_align import DeviceAlignExecutor
        self._align_exec = DeviceAlignExecutor(opt, interpret=self._interpret)

    def map_batch(self, frags) -> list[list[str]]:
        """Map a batch of fragments; returns per-fragment output lines."""
        opt, mi = self.opt, self.mi
        if opt.flag & C.MM_F_SPLICE or any(len(f.segs) > 1 for f in frags):
            # splice & multi-seg chain on host for now (dr>max_dist_y rule
            # and per-seg handling); single-seg presets take the device path
            from .pipeline import map_fragment_output
            return [map_fragment_output(mi, opt, f.segs) for f in frags]

        pending: list[_PendingRead] = []
        with self.timers.time("seed"):
            for idx, frag in enumerate(frags):
                segs = frag.segs
                qlens = [len(s.seq) for s in segs]
                qlen_sum = sum(qlens)
                qname = segs[0].name
                mv = collect_minimizers(opt, mi, [s.seq for s in segs])
                if len(mv) == 0:
                    pending.append(_PendingRead(idx, np.empty((0, 2), np.uint64),
                                                None, segs, qlens, qlen_sum, 0, 0, 0))
                    continue
                sh = collect_seed_hits(mi, opt.flag, opt.mid_occ, mv, qname, qlen_sum)
                gq, gr = compute_gap_bounds(opt, qlen_sum)
                pending.append(_PendingRead(idx, sh.anchors, sh, segs, qlens,
                                            qlen_sum,
                                            C.qname_hash(qname, qlen_sum, opt.seed),
                                            gq, gr))

        chains = self._chain_batch(pending)

        # regions + batched cross-read alignment on device
        with self.timers.time("regions"):
            reads = [self._regions_for_read(pr, ch)
                     for pr, ch in zip(pending, chains)]
        with self.timers.time("align"):
            from .batch_align import run_scheduler
            from .pipeline import align_regs_gen
            gens, gen_at = [], []
            for k, (pr, (regs, a)) in enumerate(zip(pending, reads)):
                if regs and (opt.flag & C.MM_F_CIGAR):
                    gens.append(align_regs_gen(opt, mi, pr.qlens[0],
                                               pr.segs[0].seq, regs, a))
                    gen_at.append(k)
            if gens:
                for k, regs in zip(gen_at, run_scheduler(gens,
                                                         self._align_exec)):
                    reads[k] = (regs, reads[k][1])

        lines: list[list[str]] = []
        with self.timers.time("epilogue"):
            for pr, (regs, a) in zip(pending, reads):
                lines.append(self._finish_read(pr, regs))
        return lines

    def _chain_batch(self, pending) -> list[Chains]:
        """Score all reads' chains, batched by size bucket on device."""
        from ..ops import chain_pallas as CP
        opt = self.opt
        jax = self._jax
        results: dict[int, Chains] = {}
        by_bucket: dict[int, list[int]] = {}
        host_idx: list[int] = []
        for k, pr in enumerate(pending):
            n = len(pr.anchors)
            if n == 0:
                results[k] = Chains(np.empty((0, 2), np.uint64),
                                    np.empty(0, np.uint64))
                continue
            b = next((b for b in BUCKETS if n <= b), None)
            # non-default gap bounds or oversized reads take the host path
            if b is None or opt.bw >= CP.TBL:
                host_idx.append(k)
            else:
                by_bucket.setdefault(b, []).append(k)

        for b, idxs in sorted(by_bucket.items()):
            reads = []
            for k in idxs:
                a = pending[k].anchors
                xhi, rpos, qpos, span, sid = split_anchors(a)
                reads.append(dict(xhi=xhi, rpos=rpos, qpos=qpos, span=span,
                                  sid=sid,
                                  avg_qspan=np.float32(span.sum() / len(a))))
            with self.timers.time("pack"):
                packed, nn, w1, exc, host_flag = CP.pack_reads(
                    reads, b, pending[idxs[0]].gap_ref)
            gq = pending[idxs[0]].gap_qry  # single-seg: same for all reads
            gr = pending[idxs[0]].gap_ref
            with self.timers.time("kernel"):
                f, p, flag = CP.chain_scores_batch(
                    *(packed[x] for x in ("xhi", "rpos", "qpos", "span", "sid",
                                          "stw")),
                    nn, w1, exc, max_n=b, max_dist_x=gr, max_dist_y=gq,
                    bw=opt.bw, max_skip=opt.max_chain_skip,
                    is_cdna=bool(opt.flag & C.MM_F_SPLICE), many_segs=False,
                    interpret=self._interpret)
                f = np.asarray(f)
                p = np.asarray(p)
                flag = np.asarray(flag)[:, 0]
            with self.timers.time("bottom"):
                for r, k in enumerate(idxs):
                    if host_flag[r] or flag[r]:
                        host_idx.append(k)
                        self.timers.count("fallback")
                        continue
                    a = pending[k].anchors
                    n = len(a)
                    v = _v_from_fp(f[r, :n], p[r, :n])
                    cx, cy, cf, cp = compact_from_fpv(
                        a, f[r, :n], p[r, :n], v, opt.min_chain_score)
                    results[k] = chain_backtrack(cx, cy, cf, cp, opt.min_cnt,
                                                 opt.min_chain_score)
                    self.timers.count("device_reads")

        with self.timers.time("host_fallback"):
            for k in host_idx:
                pr = pending[k]
                results[k] = chain_dp(pr.gap_ref, pr.gap_qry, opt.bw,
                                      opt.max_chain_skip, opt.min_cnt,
                                      opt.min_chain_score,
                                      bool(opt.flag & C.MM_F_SPLICE), 1,
                                      pr.anchors)
        return [results[k] for k in range(len(pending))]

    def _regions_for_read(self, pr: _PendingRead, ch: Chains):
        """gen_regs + chain_post + est_err (the pre-alignment epilogue)."""
        opt, mi = self.opt, self.mi
        if not len(ch.u):
            return [], None
        a = ch.anchors.copy()
        regs = H.gen_regs(pr.hash_, pr.qlen_sum, ch.u, a)
        regs = chain_post(opt, pr.gap_ref, mi, pr.qlen_sum, 1, pr.qlens,
                          regs, a)
        if not (opt.flag & C.MM_F_SR):
            est_err(mi, pr.qlen_sum, regs, a, pr.sh.mini_pos)
        return regs, a

    def _finish_read(self, pr: _PendingRead, regs: list) -> list[str]:
        opt, mi = self.opt, self.mi
        rec = pr.segs[0]
        if regs:
            H.set_mapq(regs, opt.min_chain_score, opt.a, pr.sh.rep_len,
                       bool(opt.flag & C.MM_F_SR))
        lines = []
        regss = [regs]
        for j, r in enumerate(regs):
            if (opt.flag & C.MM_F_NO_PRINT_2ND) and r.id != r.parent:
                continue
            if opt.flag & C.MM_F_OUT_SAM:
                lines.append(out.write_sam(mi, rec, 0, j, 1, regss, opt.flag))
            else:
                lines.append(out.write_paf(mi, rec, r, opt.flag))
        if not regs and (opt.flag & C.MM_F_OUT_SAM):
            lines.append(out.write_sam(mi, rec, 0, -1, 1, regss, opt.flag))
        return lines


def _v_from_fp(f: np.ndarray, p: np.ndarray) -> np.ndarray:
    v = np.zeros(len(f), dtype=np.int64)
    for i in range(len(f)):
        pi = p[i]
        v[i] = v[pi] if pi >= 0 and v[pi] > f[i] else f[i]
    return v
