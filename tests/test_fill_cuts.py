"""Parity fuzz for the native gap-fill cut enumerators
(native/align_epilogue.cc mm2tpu_enum_fill_cuts{,_hpc}) against a verbatim
Python replay of the reference's fill-loop structure (align.c:560-608).
align1_gen iterates these cut lists instead of every anchor."""
import numpy as np
import pytest

from minimap2_chaindp_tpu import constants as C
from minimap2_chaindp_tpu.align import adjust_minier
from minimap2_chaindp_tpu.native import (_np_ptr, enum_fill_cuts_hpc_native,
                                         enum_fill_cuts_native, load_align)

pytestmark = pytest.mark.skipif(load_align() is None,
                                reason="native toolchain unavailable")


def py_cuts(a, as1, cnt1, adj, min_ksw, rs, qs):
    cuts = []
    rs_c, qs_c = rs, qs
    i = 1
    while i < cnt1:
        ay_i = int(a[as1 + i, 1])
        if (ay_i & (C.MM_SEED_IGNORE | C.MM_SEED_TANDEM)) and i != cnt1 - 1:
            i += 1
            continue
        re_c, qe_c = adj(as1 + i)
        if i == cnt1 - 1 or (ay_i & C.MM_SEED_LONG_JOIN) or \
           (qe_c - qs_c >= min_ksw and re_c - rs_c >= min_ksw):
            cuts.append((i, re_c, qe_c, bool(ay_i & C.MM_SEED_LONG_JOIN)))
            rs_c, qs_c = re_c, qe_c
        i += 1
    return cuts


def test_fill_cuts_parity():
    rng = np.random.default_rng(0)
    for trial in range(100):
        n = int(rng.integers(1, 400))
        rp = np.sort(rng.integers(0, 100000, n)).astype(np.uint64)
        qp = np.sort(rng.integers(0, 50000, n)).astype(np.uint64)
        a = np.zeros((n, 2), np.uint64)
        a[:, 0] = rp
        flags = rng.choice(
            [0, C.MM_SEED_IGNORE, C.MM_SEED_TANDEM, C.MM_SEED_LONG_JOIN],
            n, p=[.7, .1, .1, .1]).astype(np.uint64)
        a[:, 1] = qp | (np.uint64(15) << np.uint64(32)) | flags
        kh = 7
        rs, qs = int(rp[0]) - kh, int(qp[0]) - kh
        mk = int(rng.choice([50, 200, 1000]))
        nat = enum_fill_cuts_native(a, 0, n, kh, mk, rs, qs)
        ax_lo = a[:, 0].astype(np.uint32).astype(np.int32)
        ay_lo = a[:, 1].astype(np.uint32).astype(np.int32)

        def adj(i):
            return int(ax_lo[i]) - kh, int(ay_lo[i]) - kh
        assert nat == py_cuts(a, 0, n, adj, mk, rs, qs), trial


def test_fill_cuts_hpc_parity():
    rng = np.random.default_rng(1)

    class MiStub:
        pass

    mi = MiStub()
    for trial in range(100):
        n = int(rng.integers(2, 200))
        slen = 60000
        S = rng.integers(0, 4, slen, dtype=np.uint8)
        for _ in range(300):  # plant homopolymer runs
            st = int(rng.integers(0, slen - 20))
            S[st:st + int(rng.integers(2, 15))] = S[st]
        qlen = 30000
        q = rng.integers(0, 4, qlen, dtype=np.uint8)
        rp = np.sort(rng.integers(20, slen - 1, n)).astype(np.uint64)
        qp = np.sort(rng.integers(20, qlen - 1, n)).astype(np.uint64)
        a = np.zeros((n, 2), np.uint64)
        a[:, 0] = rp
        flags = rng.choice(
            [0, C.MM_SEED_IGNORE, C.MM_SEED_LONG_JOIN],
            n, p=[.8, .1, .1]).astype(np.uint64)
        a[:, 1] = qp | (np.uint64(19) << np.uint64(32)) | flags

        class Seq:
            offset = 0
            length = slen
        mi.flag = C.MM_I_HPC
        mi.S = S
        mi.seqs = [Seq()]
        qseq0 = [q, q]

        def adjh(i):
            return adjust_minier(mi, qseq0, int(a[i, 0]), int(a[i, 1]))
        rs, qs = adjh(0)
        mk = int(rng.choice([50, 500]))
        nat = enum_fill_cuts_hpc_native(a, 0, n, q, _np_ptr(S), mk, rs, qs)
        assert nat == py_cuts(a, 0, n, adjh, mk, rs, qs), trial
