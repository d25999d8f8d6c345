"""Validate the Pallas chaining kernel (interpret mode on CPU) against the
exact host model, including the flag/fallback contract."""
import numpy as np
import pytest

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu.options import set_opt
from minimap2_chaindp_tpu.io.fastx import read_fastx
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.ops.seeds import collect_minimizers, collect_seed_hits
from minimap2_chaindp_tpu.ops.chain import chain_dp
from minimap2_chaindp_tpu.ops.chain_jax import split_anchors, compact_from_fpv
from minimap2_chaindp_tpu.ops.chain import chain_backtrack
from minimap2_chaindp_tpu.ops import chain_pallas as CP


def reads_from(ref_fa, q_fa):
    io, mo = set_opt(None)
    refs = list(read_fastx(f"{REF_TEST_DIR}/{ref_fa}"))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    out = []
    for q in read_fastx(f"{REF_TEST_DIR}/{q_fa}"):
        mv = collect_minimizers(mo, mi, [q.seq])
        sh = collect_seed_hits(mi, mo.flag, mo.mid_occ, mv, q.name, len(q.seq))
        out.append(sh.anchors)
    return out, mo


def run_batch(anchor_list, mo, gq=None, gr=None, is_cdna=False,
              many_segs=False):
    gq = mo.max_gap if gq is None else gq
    gr = mo.max_gap if gr is None else gr
    reads = []
    for a in anchor_list:
        xhi, rpos, qpos, span, sid = split_anchors(a)
        reads.append(dict(xhi=xhi, rpos=rpos, qpos=qpos, span=span, sid=sid,
                          avg_qspan=np.float32(span.sum()) / np.float32(max(len(a), 1))))
    max_n = max(len(a) for a in anchor_list)
    max_n = (max_n + 127) // 128 * 128
    packed, nn, w1, exc, host_flag = CP.pack_reads(reads, max_n, gr)
    args = (packed["xhi"], packed["rpos"], packed["qpos"], packed["span"],
            packed["sid"], packed["stw"], nn, w1, exc)
    kw = dict(max_n=max_n, max_dist_x=gr, max_dist_y=gq, bw=mo.bw,
              max_skip=mo.max_chain_skip, is_cdna=is_cdna,
              many_segs=many_segs, interpret=True)
    f, p, flag = CP.chain_scores_batch(*args, **kw)
    # the packed single-reduction epilogue (+ pair-unrolled scan on the
    # single-seg path) must agree bit for bit with the classic variant
    f2, p2, flag2 = CP.chain_scores_batch(*args, score_bound=20000, **kw)
    assert np.array_equal(np.asarray(f), np.asarray(f2))
    assert np.array_equal(np.asarray(p), np.asarray(p2))
    assert np.array_equal(np.asarray(flag), np.asarray(flag2))
    return np.asarray(f), np.asarray(p), np.asarray(flag)


def check(anchor_list, mo):
    f, p, flag = run_batch(anchor_list, mo)
    n_flagged = 0
    for r, a in enumerate(anchor_list):
        host = chain_dp(mo.max_gap, mo.max_gap, mo.bw, mo.max_chain_skip,
                        mo.min_cnt, mo.min_chain_score, False, 1, a)
        if flag[r, 0]:
            n_flagged += 1
            continue  # contract: flagged reads go to the host path
        cx, cy, cf, cp = compact_from_fpv(a, f[r, :len(a)], p[r, :len(a)],
                                          _v_from_fp(f[r], p[r], len(a)),
                                          mo.min_chain_score)
        dev = chain_backtrack(cx, cy, cf, cp, mo.min_cnt, mo.min_chain_score)
        assert np.array_equal(host.u, dev.u), f"read {r} u mismatch"
        assert np.array_equal(host.anchors, dev.anchors), f"read {r} anchors"
    return n_flagged


def _v_from_fp(f, p, n):
    v = np.zeros(n, dtype=np.int64)
    for i in range(n):
        pi = p[i]
        v[i] = v[pi] if pi >= 0 and v[pi] > f[i] else f[i]
    return v


def test_pallas_chain_mt_inv():
    a1, mo = reads_from("MT-human.fa", "MT-orang.fa")
    a2, _ = reads_from("t-inv.fa", "q-inv.fa")
    # interpret mode is slow; cap per-read anchor counts
    batch = [a[:512] for a in a1 + a2]
    n_flagged = check(batch, mo)
    assert n_flagged == 0  # no fallback needed on the bundled data


def test_pallas_chain_random():
    rng = np.random.default_rng(1)
    _, mo = set_opt(None)
    batch = []
    for trial in range(6):
        n = int(rng.integers(20, 300))
        rp = np.sort(rng.integers(0, 3000, n))
        qp = np.maximum(rp + rng.integers(-200, 200, n), 0)
        span = rng.integers(13, 20, n)
        x = rp.astype(np.uint64)
        y = span.astype(np.uint64) << np.uint64(32) | qp.astype(np.uint64)
        anchors = np.stack([x, y], axis=1)
        anchors = anchors[np.argsort(anchors[:, 0], kind="stable")]
        batch.append(anchors)
    check(batch, mo)


def synth_anchors(rng, n, seg_split=None, big_gaps=False):
    rp = np.sort(rng.integers(0, 60000 if big_gaps else 3000, n))
    qp = np.maximum(rp // (30 if big_gaps else 1)
                    + rng.integers(-200, 200, n), 0)
    span = rng.integers(13, 20, n)
    y = span.astype(np.uint64) << np.uint64(32) | qp.astype(np.uint64)
    if seg_split is not None:
        seg = (np.arange(n) >= seg_split).astype(np.uint64)
        y |= seg << np.uint64(48)
    anchors = np.stack([rp.astype(np.uint64), y], axis=1)
    return anchors[np.argsort(anchors[:, 0], kind="stable")]


def check_mode(batch, mo, gq, gr, is_cdna, many_segs, n_segs):
    f, p, flag = run_batch(batch, mo, gq, gr, is_cdna, many_segs)
    for r, a in enumerate(batch):
        host = chain_dp(gr, gq, mo.bw, mo.max_chain_skip, mo.min_cnt,
                        mo.min_chain_score, is_cdna, n_segs, a)
        if flag[r, 0]:
            continue
        cx, cy, cf, cp = compact_from_fpv(a, f[r, :len(a)], p[r, :len(a)],
                                          _v_from_fp(f[r], p[r], len(a)),
                                          mo.min_chain_score)
        dev = chain_backtrack(cx, cy, cf, cp, mo.min_cnt, mo.min_chain_score)
        assert np.array_equal(host.u, dev.u), f"read {r} u mismatch"
        assert np.array_equal(host.anchors, dev.anchors), f"read {r} anchors"


def test_pallas_chain_cdna():
    """is_cdna (splice) scoring rules: large ref gaps, max_dist_y < TBL."""
    rng = np.random.default_rng(3)
    _, mo = set_opt("splice")
    batch = [synth_anchors(rng, int(rng.integers(30, 250)), big_gaps=True)
             for _ in range(6)]
    check_mode(batch, mo, 2000, 200000, True, False, 1)


def test_pallas_chain_many_segs():
    """many_segs (paired-end) rule: same-seg dr > max_dist_y invalid."""
    rng = np.random.default_rng(4)
    _, mo = set_opt("sr")
    batch = []
    for _ in range(6):
        n = int(rng.integers(30, 200))
        batch.append(synth_anchors(rng, n, seg_split=n // 2))
    check_mode(batch, mo, 600, 800, False, True, 2)


def test_use_exc_variant_equivalence():
    """Forcing the exception-patch variant (use_exc=True) gives the same
    f/p as the inferred dispatch (which drops the patches when every
    read's exception list is empty)."""
    anchor_list, mo = reads_from("MT-human.fa", "MT-orang.fa")
    reads = []
    for a in anchor_list:
        xhi, rpos, qpos, span, sid = split_anchors(a)
        reads.append(dict(xhi=xhi, rpos=rpos, qpos=qpos, span=span, sid=sid,
                          avg_qspan=np.float32(span.sum()) / np.float32(max(len(a), 1))))
    max_n = (max(len(a) for a in anchor_list) + 127) // 128 * 128
    packed, nn, w1, exc, _ = CP.pack_reads(reads, max_n, mo.max_gap)
    kw = dict(max_n=max_n, max_dist_x=mo.max_gap, max_dist_y=mo.max_gap,
              bw=mo.bw, max_skip=mo.max_chain_skip, is_cdna=False,
              many_segs=False, interpret=True)
    ins = [packed[k] for k in ("xhi", "rpos", "qpos", "span", "sid", "stw")]
    f0, p0, _ = CP.chain_scores_batch(*ins, nn, w1, exc, **kw)
    f1, p1, _ = CP.chain_scores_batch(*ins, nn, w1, exc, **kw, use_exc=True)
    assert np.array_equal(np.asarray(f0), np.asarray(f1))
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
