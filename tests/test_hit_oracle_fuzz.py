"""Fuzz the epilogue ports against the REAL reference functions: hit.c/pe.c
compiled into .golden/libhit_oracle.so (golden/hit_test.c shim). Covers the
float32 arithmetic chains and the in-place compaction aliasing that pure
e2e byte-diffs only hit on rare inputs."""
import ctypes
import os

import numpy as np
import pytest

from minimap2_chaindp_tpu.hits import Region, Extra, set_mapq, select_sub
from minimap2_chaindp_tpu.pe import select_sub_multi

ORACLE = "/root/repo/.golden/libhit_oracle.so"
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle lib not built")


def _lib():
    lib = ctypes.CDLL(ORACLE)
    vp = ctypes.c_void_p
    lib.hit_oracle_set_mapq.restype = None
    lib.hit_oracle_set_mapq.argtypes = [vp, vp, ctypes.c_int64] \
        + [ctypes.c_int64] * 4 + [vp]
    lib.hit_oracle_select_sub.restype = ctypes.c_int64
    lib.hit_oracle_select_sub.argtypes = [vp, vp, ctypes.c_int64,
                                          ctypes.c_double, ctypes.c_int64,
                                          ctypes.c_int64, vp]
    lib.hit_oracle_select_sub_multi.restype = ctypes.c_int64
    lib.hit_oracle_select_sub_multi.argtypes = [
        vp, vp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, vp, vp]
    return lib


def _ptr(a):
    return a.__array_interface__["data"][0]


def _mk_regs(rng, n, with_p=True, pe=False, qlens=(150, 150)):
    """Random region set with a consistent parent structure."""
    regs, rows, auxs = [], np.zeros((n, 14), np.int64), \
        np.zeros((n, 4), np.int64)
    n_pri = 0
    for i in range(n):
        primary = i == 0 or (rng.random() < 0.4 and n_pri < 4)
        parent = i if primary else int(rng.integers(0, i))
        # children point at an EARLIER index; redirect to its parent slot's
        # primary like set_parent does
        if not primary:
            parent = regs[parent].parent
        score = int(rng.integers(20, 30000))
        qs = int(rng.integers(0, qlens[0] + qlens[1] - 20)) if pe \
            else int(rng.integers(0, 800))
        qe = qs + int(rng.integers(20, 200))
        rs = int(rng.integers(0, 100000))
        r = Region(id=i, cnt=int(rng.integers(2, 200)),
                   rid=int(rng.integers(0, 3)), score=score,
                   qs=qs, qe=qe, rs=rs, re=rs + int(rng.integers(20, 500)),
                   parent=parent,
                   subsc=int(rng.integers(0, score + 1)),
                   mlen=int(rng.integers(10, 20000)),
                   n_sub=int(rng.integers(0, 40)),
                   score0=score, rev=int(rng.integers(0, 2)))
        r.blen = r.mlen + int(rng.integers(0, 10000))
        if with_p:
            dp_max = int(rng.integers(1, 40000))
            r.p = Extra(dp_max=dp_max,
                        dp_max2=int(rng.integers(0, dp_max + 1)))
        if primary:
            n_pri += 1
        regs.append(r)
        rows[i] = [r.id, r.cnt, r.rid, r.score, r.qs, r.qe, r.rs, r.re,
                   r.parent, r.subsc, r.mlen, r.blen, r.n_sub, r.score0]
        auxs[i] = [r.p.dp_max if r.p else 0, r.p.dp_max2 if r.p else 0,
                   1 if r.p else 0, r.rev]
    return regs, rows, auxs


def test_set_mapq_vs_oracle():
    lib = _lib()
    rng = np.random.default_rng(0)
    for it in range(3000):
        n = int(rng.integers(1, 6))
        regs, rows, auxs = _mk_regs(rng, n, with_p=bool(rng.integers(0, 2)))
        min_sc = int(rng.integers(10, 60))
        match_sc = int(rng.integers(1, 4))
        rep_len = int(rng.integers(0, 2000))
        is_sr = bool(rng.integers(0, 2))
        out = np.zeros(n, np.int64)
        lib.hit_oracle_set_mapq(_ptr(rows), _ptr(auxs), n, min_sc,
                                match_sc, rep_len, 1 if is_sr else 0,
                                _ptr(out))
        set_mapq(regs, min_sc, match_sc, rep_len, is_sr)
        got = [r.mapq for r in regs]
        assert got == out.tolist(), (it, got, out.tolist())


def test_select_sub_vs_oracle():
    lib = _lib()
    rng = np.random.default_rng(1)
    for it in range(3000):
        n = int(rng.integers(1, 10))
        regs, rows, auxs = _mk_regs(rng, n)
        pri_ratio = float(rng.choice([0.8, 0.6, 0.15, 0.5]))
        min_diff = int(rng.integers(0, 50))
        best_n = int(rng.integers(1, 6))
        out = np.zeros(n, np.int64)
        k = lib.hit_oracle_select_sub(_ptr(rows), _ptr(auxs), n,
                                      pri_ratio, min_diff, best_n, _ptr(out))
        kept = select_sub(regs, pri_ratio, min_diff, best_n)
        # compare the ORIGINAL ids of survivors (sync_regs renumbers;
        # the oracle shim reports pre-sync ids the same way via r.id...
        # after mm_sync_regs ids are renumbered identically on both sides)
        assert [r.id for r in kept] == out[:k].tolist(), it


def test_select_sub_multi_vs_oracle():
    lib = _lib()
    rng = np.random.default_rng(2)
    qlens = [151, 149]
    for it in range(3000):
        n = int(rng.integers(1, 10))
        regs, rows, auxs = _mk_regs(rng, n, pe=True, qlens=qlens)
        pri_ratio = float(rng.choice([0.8, 0.6, 0.15]))
        pri1, pri2 = 0.2, 0.7
        max_gap_ref = int(rng.integers(100, 5000))
        min_diff = int(rng.integers(0, 50))
        best_n = int(rng.integers(1, 6))
        out = np.zeros(n, np.int64)
        ql64 = np.array(qlens, np.int64)
        k = lib.hit_oracle_select_sub_multi(
            _ptr(rows), _ptr(auxs), n, pri_ratio, pri1, pri2, max_gap_ref,
            min_diff, best_n, 2, _ptr(ql64), _ptr(out))
        kept = select_sub_multi(regs, pri_ratio, pri1, pri2, max_gap_ref,
                                min_diff, best_n, 2, qlens)
        assert [r.id for r in kept] == out[:k].tolist(), it


def test_set_parent_vs_oracle():
    lib = _lib()
    vp = ctypes.c_void_p
    lib.hit_oracle_set_parent.restype = None
    lib.hit_oracle_set_parent.argtypes = [vp, vp, ctypes.c_int64,
                                          ctypes.c_double, ctypes.c_int64,
                                          vp, vp]
    from minimap2_chaindp_tpu.hits import set_parent
    rng = np.random.default_rng(3)
    for it in range(3000):
        n = int(rng.integers(1, 10))
        regs, rows, auxs = _mk_regs(rng, n)
        # set_parent expects score-descending order (gen_regs output)
        regs.sort(key=lambda r: -r.score)
        for i, r in enumerate(regs):
            r.parent = 0
            r.subsc = 0
            rows[i] = [r.id, r.cnt, r.rid, r.score, r.qs, r.qe, r.rs, r.re,
                       0, 0, r.mlen, r.blen, r.n_sub, r.score0]
            auxs[i] = [r.p.dp_max if r.p else 0, r.p.dp_max2 if r.p else 0,
                       1 if r.p else 0, r.rev]
        mask_level = float(rng.choice([0.5, 0.3, 0.9]))
        sub_diff = int(rng.integers(0, 20))
        op = np.zeros(n, np.int64)
        osub = np.zeros(n, np.int64)
        lib.hit_oracle_set_parent(_ptr(rows), _ptr(auxs), n, mask_level,
                                  sub_diff, _ptr(op), _ptr(osub))
        set_parent(regs, mask_level, sub_diff)
        assert [r.parent for r in regs] == op.tolist(), it
        assert [r.subsc for r in regs] == osub.tolist(), it


def test_pair_vs_oracle():
    lib = _lib()
    vp = ctypes.c_void_p
    lib.hit_oracle_pair.restype = None
    lib.hit_oracle_pair.argtypes = [vp, vp, ctypes.c_int64,
                                    vp, vp, ctypes.c_int64] \
        + [ctypes.c_int64] * 4 + [vp, vp, vp, vp, vp]
    from minimap2_chaindp_tpu.pe import pair
    rng = np.random.default_rng(4)
    qlens = [151, 149]
    for it in range(2000):
        sides = []
        for s in range(2):
            n = int(rng.integers(1, 5))
            regs, rows, _ = _mk_regs(rng, n)
            auxs6 = np.zeros((n, 6), np.int64)
            for i, r in enumerate(regs):
                r.hash = int(rng.integers(0, 1 << 32))
                r.mapq = int(rng.integers(0, 61))
                r.rev = int(rng.integers(0, 2))
                # keep coordinates tight so FR pairs actually form
                r.rid = int(rng.integers(0, 2))
                r.rs = int(rng.integers(0, 3000))
                r.re = r.rs + int(rng.integers(50, 400))
                rows[i] = [r.id, r.cnt, r.rid, r.score, r.qs, r.qe,
                           r.rs, r.re, r.parent, r.subsc, r.mlen, r.blen,
                           r.n_sub, r.score0]
                auxs6[i] = [r.p.dp_max, r.p.dp_max2, 1, r.rev, r.hash,
                            r.mapq]
            sides.append((regs, rows, auxs6))
        (regs0, rows0, a0), (regs1, rows1, a1) = sides
        max_gap_ref = int(rng.integers(200, 2000))
        pe_bonus = int(rng.integers(0, 50))
        sub_diff = int(rng.integers(0, 20))
        match_sc = int(rng.integers(1, 4))
        n0, n1 = len(regs0), len(regs1)
        om0, of0 = np.zeros(n0, np.int64), np.zeros(n0, np.int64)
        om1, of1 = np.zeros(n1, np.int64), np.zeros(n1, np.int64)
        ql64 = np.array(qlens, np.int64)
        lib.hit_oracle_pair(_ptr(rows0), _ptr(a0), n0, _ptr(rows1),
                            _ptr(a1), n1, max_gap_ref, pe_bonus, sub_diff,
                            match_sc, _ptr(ql64), _ptr(om0), _ptr(of0),
                            _ptr(om1), _ptr(of1))
        pair(max_gap_ref, pe_bonus, sub_diff, match_sc, qlens,
             [regs0, regs1])
        assert [r.mapq for r in regs0] == om0.tolist(), it
        assert [r.proper_frag for r in regs0] == of0.tolist(), it
        assert [r.mapq for r in regs1] == om1.tolist(), it
        assert [r.proper_frag for r in regs1] == of1.tolist(), it
