"""Fuzz the remaining epilogue ports against the REAL reference code:
mm_filter_regs / mm_split_reg / mm_seg_gen (hit.c) and the align.c statics
mm_fix_cigar / mm_update_extra (via golden/align_test.c's #include shim),
all compiled into .golden/libhit_oracle.so. Covers the split-score float32
rounding, seg-coordinate shifts, indel left-alignment, zero-op squeezing,
and the running-score dp_max recompute that e2e diffs exercise rarely."""
import ctypes
import os

import numpy as np
import pytest

from minimap2_chaindp_tpu.hits import gen_regs, set_parent, split_reg, \
    filter_regs, Region, Extra
from minimap2_chaindp_tpu.pe import seg_gen
from minimap2_chaindp_tpu import align as AL
from minimap2_chaindp_tpu import constants as C

from test_hit_oracle_fuzz import ORACLE, _lib, _ptr, _mk_regs, _mk_chains

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle lib not built")
vp = ctypes.c_void_p


def _rows_from_regs(regs):
    rows = np.zeros((len(regs), 15), np.int64)
    auxs = np.zeros((len(regs), 4), np.int64)
    for i, r in enumerate(regs):
        rows[i] = [r.id, r.cnt, r.rid, r.score, r.qs, r.qe, r.rs, r.re,
                   r.parent, r.subsc, r.mlen, r.blen, r.n_sub, r.score0,
                   r.as_]
        auxs[i] = [r.p.dp_max if r.p else 0, r.p.dp_max2 if r.p else 0,
                   1 if r.p else 0, r.rev]
    return rows, auxs


def test_filter_regs_vs_oracle():
    lib = _lib()
    lib.hit_oracle_filter_regs.restype = ctypes.c_int64
    lib.hit_oracle_filter_regs.argtypes = [vp, vp, vp] \
        + [ctypes.c_int64] * 5 + [ctypes.c_double, vp]

    class Opt:
        pass

    rng = np.random.default_rng(11)
    n_dropped = 0
    for it in range(4000):
        n = int(rng.integers(1, 10))
        regs, rows, auxs = _mk_regs(rng, n)
        flags = np.zeros(n, np.int64)
        for i, r in enumerate(regs):
            if rng.random() < 0.3:           # some regions lack base aln
                r.p = None
                auxs[i, :3] = 0
            r.inv = int(rng.random() < 0.1)
            r.seg_split = int(rng.random() < 0.1)
            flags[i] = r.inv | (r.seg_split << 1)
        qlen = int(rng.integers(100, 1000))
        opt = Opt()
        opt.min_cnt = int(rng.integers(1, 120))
        opt.min_chain_score = int(rng.integers(1, 15000))
        opt.min_dp_max = int(rng.integers(1, 30000))
        # exercise the f32 clip-ratio compare near its boundary too
        opt.max_clip_ratio = float(rng.choice([1.0, 0.5, 0.1, 0.99]))
        out = np.zeros(n, np.int64)
        k = lib.hit_oracle_filter_regs(
            _ptr(rows), _ptr(auxs), _ptr(flags), n, qlen, opt.min_cnt,
            opt.min_chain_score, opt.min_dp_max, opt.max_clip_ratio,
            _ptr(out))
        kept = filter_regs(regs, opt, qlen)
        if len(kept) < n:
            n_dropped += 1
        assert [r.id for r in kept] == out[:k].tolist(), it
    assert n_dropped > 500, f"filters rarely fired ({n_dropped}) - weak fuzz"


def test_split_reg_vs_oracle():
    lib = _lib()
    lib.hit_oracle_split_reg.restype = ctypes.c_int64
    lib.hit_oracle_split_reg.argtypes = [vp, vp, ctypes.c_int64, vp] \
        + [ctypes.c_int64] * 3 + [vp]

    def fields(r):
        return [r.id, r.cnt, r.score, r.as_, r.parent, r.qs, r.qe,
                r.rs, r.re, r.split]

    rng = np.random.default_rng(12)
    n_split = 0
    for it in range(3000):
        qlen = 2000
        u, a = _mk_chains(rng, 1, qlen)
        regs = gen_regs(int(rng.integers(0, 1 << 32)), qlen, u, a)
        r = regs[0]
        # sometimes mark as primary so the TMP_PRI branch fires
        if rng.random() < 0.5:
            r.parent = r.id
        r.split = int(rng.integers(0, 4))
        r.score = int(rng.integers(1, 60000))  # fuzz the f32 score split
        rows, auxs = _rows_from_regs([r])
        split_bits = r.split
        n = int(rng.integers(0, r.cnt + 2))
        out = np.zeros((2, 10), np.int64)
        did = lib.hit_oracle_split_reg(_ptr(rows[0]), _ptr(auxs[0]),
                                       split_bits, _ptr(a), len(a), n, qlen,
                                       _ptr(out))
        r2 = split_reg(r, n, qlen, a)
        assert (r2 is not None) == bool(did), it
        assert fields(r) == out[0].tolist(), it
        if r2 is not None:
            n_split += 1
            assert fields(r2) == out[1].tolist(), it
    assert n_split > 1000, f"splits rarely fired ({n_split}) - weak fuzz"


def _mk_seg_chains(rng, n_chains, qlens):
    """Chains whose anchors carry seg ids in y bits 48-55 (fragment
    coordinate space = concatenated qlens, map.c:216-229 encoding)."""
    qlen_sum = sum(qlens)
    anchors, u = [], []
    rpos = int(rng.integers(100, 1000))
    for _ in range(n_chains):
        cnt = int(rng.integers(1, 10))
        score = int(rng.integers(30, 2000))
        rev = int(rng.integers(0, 2))
        rid = int(rng.integers(0, 3))
        qpos = int(rng.integers(14, qlen_sum - 20))
        for _ in range(cnt):
            span = int(rng.integers(10, 20))
            sid = int(rng.integers(0, len(qlens)))
            x = (rev << 63) | (rid << 32) | rpos
            y = (sid << 48) | (span << 32) | qpos
            anchors.append((x, y))
            rpos += int(rng.integers(5, 60))
            qpos = min(qpos + int(rng.integers(5, 60)), qlen_sum - 1)
        u.append((score << 32) | cnt)
        rpos += int(rng.integers(100, 400))
    return (np.array(u, dtype=np.uint64),
            np.array(anchors, dtype=np.uint64).reshape(-1, 2))


def test_seg_gen_vs_oracle():
    lib = _lib()
    lib.hit_oracle_seg_gen.restype = None
    lib.hit_oracle_seg_gen.argtypes = [ctypes.c_uint64, ctypes.c_int64,
                                       vp, vp, vp, ctypes.c_int64, vp,
                                       ctypes.c_int64, vp, vp, vp, vp]
    rng = np.random.default_rng(13)
    for it in range(1500):
        n_segs = 2
        qlens = [int(rng.integers(100, 400)) for _ in range(n_segs)]
        u, a = _mk_seg_chains(rng, int(rng.integers(1, 6)), qlens)
        hash_ = int(rng.integers(0, 1 << 32))
        regs0 = gen_regs(hash_, sum(qlens), u, a.copy())
        n0 = len(regs0)
        rows, auxs = _rows_from_regs(regs0)
        qlens64 = np.array(qlens, np.int64)
        out_counts = np.zeros(n_segs, np.int64)
        out_regs = np.zeros((n_segs, n0, 10), np.int64)
        out_na = np.zeros(n_segs, np.int64)
        out_anch = np.zeros((len(a), 2), np.uint64)
        lib.hit_oracle_seg_gen(hash_, n_segs, _ptr(qlens64), _ptr(rows),
                               _ptr(auxs), n0, _ptr(a), len(a),
                               _ptr(out_counts), _ptr(out_regs),
                               _ptr(out_na), _ptr(out_anch))
        got = seg_gen(hash_, n_segs, qlens, regs0, a)
        oa = 0
        for s, (regs, a_s) in enumerate(got):
            assert len(regs) == out_counts[s], it
            exp = out_regs[s, :len(regs)].tolist()
            fields = [[r.score, r.cnt, r.as_, r.rid, r.rev, r.qs, r.qe,
                       r.rs, r.re, r.hash] for r in regs]
            assert fields == exp, it
            assert all(r.seg_split == 1 and r.seg_id == s for r in regs)
            assert len(a_s) == out_na[s], it
            assert a_s.tolist() == out_anch[oa:oa + len(a_s)].tolist(), it
            oa += len(a_s)


def _mk_cigar_case(rng, with_intron=False):
    """A random valid CIGAR (incl. zero-length ops and shift-able indels)
    plus matching qseq/tseq windows and coordinates."""
    ops = []
    n_ops = int(rng.integers(1, 12))
    for k in range(n_ops):
        op = int(rng.choice([0, 0, 0, 1, 2] + ([3] if with_intron else [])))
        ln = int(rng.choice([0, 1, 2, 3, 8, 20]))
        ops.append((op, ln))
    if all(ln == 0 for _, ln in ops):
        ops[0] = (0, 1)
    qoff = sum(ln for op, ln in ops if op in (0, 1))
    toff = sum(ln for op, ln in ops if op in (0, 2, 3))
    if qoff == 0:
        ops.append((0, 1))
        qoff += 1
        toff += 1
    qseq = rng.integers(0, 5, qoff).astype(np.uint8)  # incl. ambiguous 4
    tseq = rng.integers(0, 5, toff).astype(np.uint8)
    if rng.random() < 0.5:  # make left-shifts actually fire sometimes
        tseq[:] = rng.integers(0, 2, toff)
        qseq[:] = rng.integers(0, 2, qoff)
    cigar = [(ln << 4) | op for op, ln in ops]
    qs = int(rng.integers(0, 50))
    rs = int(rng.integers(0, 50))
    rev = int(rng.integers(0, 2))
    return cigar, qseq, tseq, qs, qs + qoff, rs, rs + toff, rev


def _rand_mat(rng):
    a = int(rng.integers(1, 4))
    b = int(rng.integers(1, 10))
    mat = np.full((5, 5), -b, np.int8)
    np.fill_diagonal(mat, a)
    mat[4, :] = mat[:, 4] = 0
    return mat.ravel()


def test_update_extra_vs_oracle():
    lib = _lib()
    lib.align_oracle_update_extra.restype = None
    lib.align_oracle_update_extra.argtypes = \
        [ctypes.c_int64] * 5 + [vp, ctypes.c_int64, vp, vp, vp,
                                ctypes.c_int64, ctypes.c_int64, vp, vp]
    rng = np.random.default_rng(14)
    import minimap2_chaindp_tpu.native as native
    use_native = native.load_align() is not None
    for it in range(4000):
        cigar, qseq, tseq, qs, qe, rs, re, rev = _mk_cigar_case(
            rng, with_intron=it % 3 == 0)
        mat = _rand_mat(rng)
        q = int(rng.integers(1, 30))
        e = int(rng.integers(1, 10))
        cig = np.array(cigar, np.uint32)
        out = np.zeros(9, np.int64)
        out_cig = np.zeros(len(cigar) + 1, np.uint32)
        lib.align_oracle_update_extra(qs, qe, rs, re, rev, _ptr(cig),
                                      len(cig), _ptr(qseq), _ptr(tseq),
                                      _ptr(mat), q, e, _ptr(out),
                                      _ptr(out_cig))
        # alternate native fused path / pure-Python path per iteration
        pure = it % 2 == 1 or not use_native
        r = Region(qs=qs, qe=qe, rs=rs, re=re, rev=rev,
                   p=Extra(cigar=list(cigar)))
        if pure:
            saved = native.fix_update_extra, native.update_extra_scan
            native.fix_update_extra = lambda *a_, **k_: None
            native.update_extra_scan = lambda *a_, **k_: None
        try:
            AL.update_extra(r, qseq, tseq, mat, q, e)
        finally:
            if pure:
                native.fix_update_extra, native.update_extra_scan = saved
        got = [r.qs, r.qe, r.rs, r.re, r.blen, r.mlen, r.p.n_ambi,
               r.p.dp_max, len(r.p.cigar)]
        assert got == out.tolist(), (it, pure)
        assert list(r.p.cigar) == out_cig[:out[8]].tolist(), (it, pure)


def test_fix_cigar_vs_oracle():
    lib = _lib()
    lib.align_oracle_fix_cigar.restype = None
    lib.align_oracle_fix_cigar.argtypes = \
        [ctypes.c_int64] * 5 + [vp, ctypes.c_int64, vp, vp, vp, vp]
    rng = np.random.default_rng(15)
    for it in range(4000):
        cigar, qseq, tseq, qs, qe, rs, re, rev = _mk_cigar_case(rng)
        cig = np.array(cigar, np.uint32)
        out = np.zeros(7, np.int64)
        out_cig = np.zeros(len(cigar) + 1, np.uint32)
        lib.align_oracle_fix_cigar(qs, qe, rs, re, rev, _ptr(cig), len(cig),
                                   _ptr(qseq), _ptr(tseq), _ptr(out),
                                   _ptr(out_cig))
        r = Region(qs=qs, qe=qe, rs=rs, re=re, rev=rev,
                   p=Extra(cigar=list(cigar)))
        qshift, tshift = AL.fix_cigar(r, qseq, tseq)
        got = [r.qs, r.qe, r.rs, r.re, qshift, tshift, len(r.p.cigar)]
        assert got == out.tolist(), it
        assert list(r.p.cigar) == out_cig[:out[6]].tolist(), it
