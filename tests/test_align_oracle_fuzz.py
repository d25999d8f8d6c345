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


def _mk_chain_anchors(rng, cnt, gappy=False):
    """One chain's ascending anchors (low-32 coords, span in y bits 32-39)."""
    anchors = []
    rpos, qpos = int(rng.integers(50, 500)), int(rng.integers(50, 500))
    for _ in range(cnt):
        span = int(rng.integers(10, 20))
        anchors.append(((0 << 63) | rpos, (span << 32) | qpos))
        if gappy and rng.random() < 0.5:
            # unbalanced gap: one coordinate jumps much more than the other
            rpos += int(rng.integers(5, 30))
            qpos += int(rng.integers(40, 400))
            if rng.random() < 0.5:
                rpos, qpos = qpos, rpos
        else:
            step = int(rng.integers(5, 60))
            rpos += step
            qpos += step + int(rng.integers(-3, 4))
    return np.array(anchors, dtype=np.uint64).reshape(-1, 2)


def test_filter_bad_seeds_vs_oracle():
    from minimap2_chaindp_tpu.align import filter_bad_seeds
    lib = _lib()
    lib.align_oracle_filter_bad_seeds.restype = None
    lib.align_oracle_filter_bad_seeds.argtypes = \
        [vp] + [ctypes.c_int64] * 5
    rng = np.random.default_rng(16)
    n_marked = 0
    for it in range(3000):
        cnt = int(rng.integers(2, 40))
        a = _mk_chain_anchors(rng, cnt, gappy=True)
        min_gap = int(rng.choice([10, 20, 50]))
        diff_thres = int(rng.choice([40, 80, 10]))
        max_ext_len = int(rng.choice([2500, 500, 100000]))
        max_ext_cnt = int(rng.choice([10, 3, 50]))
        want = a.copy()
        lib.align_oracle_filter_bad_seeds(_ptr(want), cnt, min_gap,
                                          diff_thres, max_ext_len,
                                          max_ext_cnt)
        got = a.copy()
        filter_bad_seeds(0, cnt, got, min_gap, diff_thres, max_ext_len,
                         max_ext_cnt)
        if (want[:, 1] != a[:, 1]).any():
            n_marked += 1
        assert got.tolist() == want.tolist(), it
    assert n_marked > 300, f"IGNORE marks rarely fired ({n_marked})"


def test_fix_bad_ends_vs_oracle():
    from minimap2_chaindp_tpu.align import fix_bad_ends
    import minimap2_chaindp_tpu.native as native
    lib = _lib()
    lib.align_oracle_fix_bad_ends.restype = None
    lib.align_oracle_fix_bad_ends.argtypes = \
        [ctypes.c_int64] * 3 + [vp] + [ctypes.c_int64] * 3 + [vp]
    use_native = native.load_align() is not None
    rng = np.random.default_rng(17)
    n_trim = 0
    for it in range(3000):
        cnt = int(rng.integers(1, 30))
        a = _mk_chain_anchors(rng, cnt, gappy=it % 2 == 0)
        if rng.random() < 0.15 and cnt > 2:   # LONG_JOIN break path
            k = int(rng.integers(1, cnt))
            a[k, 1] |= np.uint64(C.MM_SEED_LONG_JOIN)
        r = Region(as_=0, cnt=cnt, mlen=int(rng.integers(10, 600)))
        bw = int(rng.choice([500, 100, 50]))
        min_match = int(rng.choice([40, 10, 200]))
        out = np.zeros(2, np.int64)
        lib.align_oracle_fix_bad_ends(r.as_, r.cnt, r.mlen, _ptr(a),
                                      len(a), bw, min_match, _ptr(out))
        pure = it % 2 == 1 or not use_native
        if pure:
            saved = native.fix_bad_ends_native
            native.fix_bad_ends_native = lambda *a_, **k_: None
        try:
            as1, cnt1 = fix_bad_ends(r, a, bw, min_match)
        finally:
            if pure:
                native.fix_bad_ends_native = saved
        if (as1, cnt1) != (0, cnt):
            n_trim += 1
        assert [as1, cnt1] == out.tolist(), (it, pure)
    assert n_trim > 300, f"end trims rarely fired ({n_trim})"


def test_adjust_minier_vs_oracle():
    from types import SimpleNamespace
    from minimap2_chaindp_tpu.align import adjust_minier
    lib = _lib()
    lib.align_oracle_adjust_minier.restype = None
    lib.align_oracle_adjust_minier.argtypes = \
        [vp, ctypes.c_int64, vp, vp, ctypes.c_uint64, ctypes.c_uint64,
         ctypes.c_int64, ctypes.c_int64, vp]
    rng = np.random.default_rng(18)
    for it in range(4000):
        tlen = int(rng.integers(10, 120))
        qlen = int(rng.integers(10, 120))
        # small alphabet -> real homopolymer runs
        tb = rng.integers(0, 2, tlen).astype(np.uint8)
        qf = rng.integers(0, 2, qlen).astype(np.uint8)
        qr = qf[::-1].copy()    # content is arbitrary for this function
        is_hpc = it % 2
        k = int(rng.integers(5, 28))
        rev = int(rng.integers(0, 2))
        rpos = int(rng.integers(1, tlen))
        qpos = int(rng.integers(1, qlen))
        span = int(rng.integers(10, 20))
        ax = (rev << 63) | rpos
        ay = (span << 32) | qpos
        out = np.zeros(2, np.int64)
        lib.align_oracle_adjust_minier(_ptr(tb), tlen, _ptr(qf), _ptr(qr),
                                       ax, ay, k, is_hpc, _ptr(out))
        mi = SimpleNamespace(flag=C.MM_I_HPC if is_hpc else 0, k=k,
                             seqs=[SimpleNamespace(offset=0)], S=tb)
        r_, q_ = adjust_minier(mi, [qf, qr], ax, ay)
        assert [r_, q_] == out.tolist(), it


def test_test_zdrop_vs_oracle():
    from types import SimpleNamespace
    from minimap2_chaindp_tpu.align import test_zdrop
    import minimap2_chaindp_tpu.native as native
    lib = _lib()
    lib.align_oracle_test_zdrop.restype = ctypes.c_int64
    lib.align_oracle_test_zdrop.argtypes = \
        [vp, vp, vp, ctypes.c_int64, vp] + [ctypes.c_int64] * 9
    use_native = native.load_align() is not None
    rng = np.random.default_rng(19)
    hits = [0, 0, 0]
    for it in range(2000):
        if it % 3 == 2:
            # engineered inversion: M-run whose middle is the revcomp of
            # the target, so the probe's ksw_ll score clears the gates
            la, lb, lc = (int(rng.integers(20, 40)) for _ in range(3))
            tseq = rng.integers(0, 4, la + lb + lc).astype(np.uint8)
            qseq = tseq.copy()
            qseq[la:la + lb] = 3 - tseq[la:la + lb][::-1]
            cigar = [((la + lb + lc) << 4) | 0]
        else:
            cigar, qseq, tseq, _, _, _, _, _ = _mk_cigar_case(rng)
            if rng.random() < 0.5:   # force big mismatch stretches
                qseq[:] = rng.integers(0, 4, len(qseq))
                tseq[:] = rng.integers(0, 4, len(tseq))
        mat = _rand_mat(rng)
        opt = SimpleNamespace(
            q=int(rng.integers(2, 10)), e=int(rng.integers(1, 4)),
            zdrop=int(rng.choice([400, 50, 15])),
            zdrop_inv=int(rng.choice([200, 25, 8])),
            max_gap=5000,
            min_chain_score=int(rng.integers(5, 30)),
            min_dp_max=int(rng.integers(5, 40)),
            a=int(rng.integers(1, 3)),
            flag=int(rng.choice([0, 0, 0, C.MM_F_SR])))
        cig = np.array(cigar, np.uint32)
        # Reference quirk: when the max-drop window ends at a trailing
        # I/D/N, pos[.][1] = i+1 overshoots the window by ONE base and the
        # inversion probe reads it (align.c:70-84). In the real pipeline
        # that byte is stale content of the reused tseq buffer
        # (align.c:541/573), i.e. unpredictable. Pad both sides with the
        # same extra base so the comparison is well-defined.
        qseq = np.append(qseq, np.uint8(rng.integers(0, 4)))
        tseq = np.append(tseq, np.uint8(rng.integers(0, 4)))
        want = lib.align_oracle_test_zdrop(
            _ptr(qseq), _ptr(tseq), _ptr(cig), len(cig), _ptr(mat),
            opt.q, opt.e, opt.zdrop, opt.zdrop_inv, opt.max_gap,
            opt.min_chain_score, opt.min_dp_max, opt.a, opt.flag)
        pure = it % 2 == 1 or not use_native
        if pure:
            saved = native.zdrop_scan
            native.zdrop_scan = lambda *a_, **k_: None
        try:
            got = test_zdrop(opt, qseq, tseq, list(cigar), mat)
        finally:
            if pure:
                native.zdrop_scan = saved
        hits[want] += 1
        assert got == want, (it, pure)
    assert hits[1] > 100 and hits[2] > 100, \
        f"zdrop/inversion outcomes rarely fired ({hits})"
