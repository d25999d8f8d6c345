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
