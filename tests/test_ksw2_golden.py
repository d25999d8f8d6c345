"""Validate the NumPy ksw2 emulation bit-exactly against the reference C kernels
(driver: golden/ksw_test.c linked against the reference objects)."""
import os
import subprocess

import numpy as np
import pytest

from minimap2_chaindp_tpu.ops import ksw2 as K

DRIVER = "/root/repo/.golden/ksw_test"

pytestmark = pytest.mark.skipif(not os.path.exists(DRIVER),
                                reason="golden ksw driver not built")


def run_ref(cases):
    inp = []
    for kind, params, qseq, tseq in cases:
        inp.append(" ".join(map(str, (kind,) + params)))
        inp.append("".join(map(str, qseq)))
        inp.append("".join(map(str, tseq)))
    out = subprocess.run([DRIVER], input="\n".join(inp) + "\n",
                         capture_output=True, text=True, check=True)
    return out.stdout.strip().split("\n")


def cigar_str(cigar):
    return "".join(f"{c >> 4}{'MIDN'[c & 0xF]}" for c in cigar)


def mut(rng, seq, sub=0.08, ind=0.04):
    out = []
    for c in seq:
        r = rng.random()
        if r < sub:
            out.append(rng.integers(0, 4))
        elif r < sub + ind / 2:
            pass  # deletion
        elif r < sub + ind:
            out.append(c)
            for _ in range(int(rng.integers(1, 12))):
                out.append(rng.integers(0, 4))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def gen_cases(seed, n, scoring=(4, 2, 24, 1, 2, 4)):
    rng = np.random.default_rng(seed)
    q, e, q2, e2, a, b = scoring
    cases = []
    for i in range(n):
        tlen = int(rng.integers(10, 400))
        tseq = rng.integers(0, 4, tlen).astype(np.uint8)
        qseq = mut(rng, tseq)
        if len(qseq) == 0:
            qseq = np.array([0], dtype=np.uint8)
        w = int(rng.choice([25, 100, 751]))
        zdrop = int(rng.choice([100, 400]))
        flag = int(rng.choice([0, K.KSW_EZ_APPROX_MAX,
                               K.KSW_EZ_EXTZ_ONLY,
                               K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT,
                               K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR]))
        end_bonus = -1 if not (flag & K.KSW_EZ_EXTZ_ONLY) else int(rng.choice([-1, 10]))
        cases.append((0, (q, e, q2, e2, w, zdrop, end_bonus, flag, a, b), qseq, tseq))
    return cases


def check_extd_cases(cases):
    ref = run_ref(cases)
    for line, (kind, params, qseq, tseq) in zip(ref, cases):
        q, e, q2, e2, w, zdrop, end_bonus, flag, a, b = params
        mat = K.gen_simple_mat(5, a, b)
        ez = K.extd2(qseq, tseq, mat, q, e, q2, e2, w, zdrop, end_bonus, flag)
        parts = line.split(" ")
        got = (ez.score, ez.max, ez.zdropped, ez.max_q, ez.max_t, ez.mqe,
               ez.mqe_t, ez.mte, ez.mte_q, ez.reach_end, cigar_str(ez.cigar))
        want = tuple(int(x) for x in parts[:10]) + (parts[10] if len(parts) > 10 else "",)
        assert got == want, f"\nparams={params}\nq={qseq}\nt={tseq}\ngot ={got}\nwant={want}"


def test_extd2_default_scoring():
    check_extd_cases(gen_cases(0, 60))


def test_extd2_sr_scoring():
    check_extd_cases(gen_cases(1, 40, scoring=(12, 2, 24, 1, 2, 8)))


def test_extd2_asm_scoring():
    check_extd_cases(gen_cases(2, 40, scoring=(16, 2, 41, 1, 1, 9)))


def test_extd2_equal_len_bandful():
    # near-diagonal, large band, exercises score path (ez.score set)
    rng = np.random.default_rng(3)
    cases = []
    for i in range(20):
        tlen = int(rng.integers(50, 300))
        tseq = rng.integers(0, 4, tlen).astype(np.uint8)
        qseq = tseq.copy()
        idx = rng.integers(0, tlen, max(1, tlen // 20))
        qseq[idx] = rng.integers(0, 4, len(idx))
        cases.append((0, (4, 2, 24, 1, 751, 400, -1, 0, 2, 4), qseq, tseq))
    check_extd_cases(cases)


def test_ksw_ll():
    rng = np.random.default_rng(4)
    cases = []
    for i in range(50):
        tlen = int(rng.integers(5, 300))
        tseq = rng.integers(0, 4, tlen).astype(np.uint8)
        qseq = mut(rng, tseq)
        if len(qseq) == 0:
            qseq = np.array([1], dtype=np.uint8)
        cases.append((1, (4, 2, 0, 0, 0, 0, 0, 0, 2, 4), qseq, tseq))
    ref = run_ref(cases)
    mat = K.gen_simple_mat(5, 2, 4)
    for line, (kind, params, qseq, tseq) in zip(ref, cases):
        score, qe, te = K.ksw_ll(qseq, tseq, mat, 4, 2)
        want = tuple(int(x) for x in line.split())
        assert (score, qe, te) == want, f"\nq={qseq}\nt={tseq}\ngot={(score, qe, te)} want={want}"
