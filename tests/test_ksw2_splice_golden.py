"""Validate the splice (exts2) emulation bit-exactly against the reference kernel."""
import os
import subprocess

import numpy as np
import pytest

from minimap2_chaindp_tpu.ops import ksw2 as K
from minimap2_chaindp_tpu.ops.ksw2_splice import exts2

DRIVER = "/root/repo/.golden/ksw_test"

pytestmark = pytest.mark.skipif(not os.path.exists(DRIVER),
                                reason="golden ksw driver not built")


def run_ref(cases):
    inp = []
    for params, qseq, tseq in cases:
        inp.append(" ".join(map(str, (2,) + params)))
        inp.append("".join(map(str, qseq)))
        inp.append("".join(map(str, tseq)))
    out = subprocess.run([DRIVER], input="\n".join(inp) + "\n",
                         capture_output=True, text=True, check=True)
    return out.stdout.strip().split("\n")


def cigar_str(cigar):
    return "".join(f"{c >> 4}{'MIDN'[c & 0xF]}" for c in cigar)


def make_spliced(rng, n_exons=3, exon=60, intron=120):
    """Target with GT..AG introns; query = concatenated exons with errors."""
    exons = [rng.integers(0, 4, exon).astype(np.uint8) for _ in range(n_exons)]
    tparts = []
    for i, e in enumerate(exons):
        tparts.append(e)
        if i < n_exons - 1:
            mid = rng.integers(0, 4, intron - 4).astype(np.uint8)
            tparts.append(np.concatenate([[2, 3], mid, [0, 2]]))  # GT..AG
    tseq = np.concatenate(tparts)
    qseq = np.concatenate(exons)
    idx = rng.integers(0, len(qseq), max(1, len(qseq) // 30))
    qseq = qseq.copy()
    qseq[idx] = rng.integers(0, 4, len(idx))
    return qseq, tseq


def test_exts2_golden():
    rng = np.random.default_rng(7)
    # splice preset scoring: a=1 b=2 q=2 e=1 q2=32 noncan=9 zdrop=200
    cases = []
    for trial in range(25):
        qseq, tseq = make_spliced(rng, n_exons=int(rng.integers(2, 4)),
                                  exon=int(rng.integers(30, 90)),
                                  intron=int(rng.integers(40, 200)))
        flag = int(rng.choice([
            K.KSW_EZ_SPLICE_FOR,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SPLICE_FLANK,
            K.KSW_EZ_SPLICE_REV,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_APPROX_MAX,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_EXTZ_ONLY,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR,
        ]))
        cases.append(((2, 1, 32, 9, 0, 200, -1, flag, 1, 2), qseq, tseq))
    ref = run_ref(cases)
    mat = K.gen_simple_mat(5, 1, 2)
    for line, (params, qseq, tseq) in zip(ref, cases):
        q, e, q2, noncan, w, zdrop, eb, flag, a, b = params
        ez = exts2(qseq, tseq, mat, q, e, q2, noncan, zdrop, flag)
        parts = line.split(" ")
        got = (ez.score, ez.max, ez.zdropped, ez.max_q, ez.max_t, ez.mqe,
               ez.mqe_t, ez.mte, ez.mte_q, ez.reach_end, cigar_str(ez.cigar))
        want = tuple(int(x) for x in parts[:10]) + (parts[10] if len(parts) > 10 else "",)
        assert got == want, f"\nflag={flag}\nq={qseq}\nt={tseq}\ngot ={got}\nwant={want}"
