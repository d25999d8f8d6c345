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


def run_batch(anchor_list, mo):
    reads = []
    for a in anchor_list:
        xhi, rpos, qpos, span, sid = split_anchors(a)
        reads.append(dict(xhi=xhi, rpos=rpos, qpos=qpos, span=span, sid=sid,
                          avg_qspan=np.float32(span.sum() / max(len(a), 1))))
    max_n = max(len(a) for a in anchor_list)
    max_n = (max_n + 127) // 128 * 128
    packed, nn, w1, exc, host_flag = CP.pack_reads(reads, max_n, mo.max_gap)
    f, p, flag = CP.chain_scores_batch(
        packed["xhi"], packed["rpos"], packed["qpos"], packed["span"],
        packed["sid"], packed["stw"], nn, w1, exc, max_n=max_n, max_dist_x=mo.max_gap,
        max_dist_y=mo.max_gap, bw=mo.bw, max_skip=mo.max_chain_skip,
        is_cdna=False, many_segs=False, interpret=True)
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
