"""Parity: native/ksw2_extd2.cc vs the golden extd2 model (ops/ksw2.py).

The native path is an exact C++ port of the golden model (itself validated
bit-exactly against the reference's ksw2_extd2_sse in
tests/test_ksw2_golden.py), so equality here chains to the C reference.
Covers every row variant (left/right-aligned gaps, score-only), the ez
fields, CIGARs, zdrop, end-bonus/EXTZ_ONLY reach_end, and the int8-wrap +
stale-lane semantics via mutated-copy sequence pairs."""
import numpy as np
import pytest

from minimap2_chaindp_tpu import native
from minimap2_chaindp_tpu.ops import ksw2 as K

pytestmark = pytest.mark.skipif(native.load_ksw() is None,
                                reason="native toolchain unavailable")

MAT = K.gen_simple_mat(5, 2, 4)


def _pair(rng, ql, tl, n_frac=0.0):
    hi = 5 if n_frac else 4
    qseq = rng.integers(0, hi, ql, dtype=np.uint8)
    if tl <= ql:
        tseq = qseq[:tl].copy()
    else:
        tseq = np.concatenate(
            [qseq, rng.integers(0, hi, tl - ql, dtype=np.uint8)])
    m = rng.random(tl) < 0.15
    tseq[m] = rng.integers(0, 4, int(m.sum()), dtype=np.uint8)
    return qseq, tseq


def _check(j, params):
    ref = K.extd2(j["qseq"], j["tseq"], MAT, *params, j["w"], j["zdrop"],
                  j["end_bonus"], j["flag"])
    got = native.extd2_batch_native([j], MAT, *params)[0]
    for f in ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
              "mte_q", "score", "reach_end"):
        assert getattr(ref, f) == getattr(got, f), f
    assert ref.cigar == got.cigar


@pytest.mark.parametrize("flag", [
    0, K.KSW_EZ_EXTZ_ONLY, K.KSW_EZ_RIGHT,
    K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR,
    K.KSW_EZ_APPROX_MAX, K.KSW_EZ_APPROX_MAX | K.KSW_EZ_APPROX_DROP,
    K.KSW_EZ_SCORE_ONLY])
def test_native_extd2_fuzz(flag):
    rng = np.random.default_rng(flag + 11)
    for trial in range(25):
        ql = int(rng.integers(1, 320))
        tl = int(rng.integers(1, 320))
        qseq, tseq = _pair(rng, ql, tl, n_frac=0.1 if trial % 4 == 0 else 0)
        j = dict(qseq=qseq, tseq=tseq,
                 w=int(rng.choice([-1, 10, 50, 751])),
                 zdrop=int(rng.choice([-1, 100, 400])),
                 end_bonus=int(rng.choice([-1, 0, 10])), flag=flag)
        params = (4, 2, 24, 1) if trial % 2 else (12, 2, 32, 1)
        _check(j, params)


def test_native_extd2_batch_order():
    """Batched call returns per-job results in input order."""
    rng = np.random.default_rng(3)
    jobs = []
    for _ in range(17):
        ql = int(rng.integers(1, 200))
        tl = int(rng.integers(1, 200))
        qseq, tseq = _pair(rng, ql, tl)
        jobs.append(dict(qseq=qseq, tseq=tseq, w=751, zdrop=400,
                         end_bonus=-1, flag=K.KSW_EZ_APPROX_MAX))
    outs = native.extd2_batch_native(jobs, MAT, 4, 2, 24, 1)
    for j, got in zip(jobs, outs):
        ref = K.extd2(j["qseq"], j["tseq"], MAT, 4, 2, 24, 1, j["w"],
                      j["zdrop"], j["end_bonus"], j["flag"])
        assert ref.cigar == got.cigar and ref.score == got.score


SPLICE_MAT = K.gen_simple_mat(5, 1, 2)


@pytest.mark.parametrize("flag", [
    K.KSW_EZ_SPLICE_FOR, K.KSW_EZ_SPLICE_REV,
    K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SPLICE_FLANK,
    K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_RIGHT,
    K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_REV_CIGAR,
    K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SCORE_ONLY])
def test_native_exts2_fuzz(flag):
    from minimap2_chaindp_tpu.ops.ksw2_splice import exts2
    rng = np.random.default_rng(flag + 23)
    for trial in range(20):
        ql = int(rng.integers(1, 200))
        tl = int(rng.integers(1, 350))
        qseq = rng.integers(0, 5 if trial % 5 == 0 else 4, ql,
                            dtype=np.uint8)
        if tl <= ql:
            tseq = qseq[:tl].copy()
        else:  # exon1 + intron + exon2 shape
            tseq = np.concatenate([qseq[:ql // 2],
                                   rng.integers(0, 4, tl - ql,
                                                dtype=np.uint8),
                                   qseq[ql // 2:]])
        m = rng.random(len(tseq)) < 0.08
        tseq[m] = rng.integers(0, 4, int(m.sum()), dtype=np.uint8)
        zdrop = int(rng.choice([-1, 200, 400]))
        noncan = 9 if trial % 2 else 5
        ref = exts2(qseq, tseq, SPLICE_MAT, 6, 2, 32, noncan, zdrop, flag)
        got = native.exts2_batch_native(
            [dict(qseq=qseq, tseq=tseq, zdrop=zdrop, flag=flag)],
            SPLICE_MAT, 6, 2, 32, noncan)[0]
        for f in ("max", "zdropped", "max_q", "max_t", "mqe", "mqe_t",
                  "mte", "mte_q", "score"):
            assert getattr(ref, f) == getattr(got, f), f
        assert ref.cigar == got.cigar


def test_native_extd2_edges():
    rng = np.random.default_rng(4)
    for ql, tl in [(1, 1), (1, 40), (40, 1), (16, 16), (17, 15)]:
        qseq, tseq = _pair(rng, ql, tl)
        for flag in (0, K.KSW_EZ_EXTZ_ONLY, K.KSW_EZ_RIGHT):
            _check(dict(qseq=qseq, tseq=tseq, w=-1, zdrop=-1, end_bonus=0,
                        flag=flag), (4, 2, 24, 1))
