"""Validate the Pallas splice (exts2) kernel mode bit-exactly against the
NumPy golden model (ops/ksw2_splice.py, itself validated against the
reference C kernel in test_ksw2_splice_golden.py)."""
import numpy as np
import pytest

from minimap2_chaindp_tpu.ops import ksw2 as K
from minimap2_chaindp_tpu.ops import ksw2_pallas as KP
from minimap2_chaindp_tpu.ops.ksw2_splice import exts2


def make_spliced(rng, n_exons=3, exon=60, intron=120, err=0.05):
    genome, cdna = [], []
    for i in range(n_exons):
        ex = rng.integers(0, 4, exon + int(rng.integers(0, 30))).tolist()
        genome.extend(ex)
        q = [c for c in ex if rng.random() > err * 0.5]
        cdna.extend(q)
        if i != n_exons - 1:
            ilen = intron + int(rng.integers(0, 60))
            genome.extend([2, 3] + rng.integers(0, 4, ilen - 4).tolist()
                          + [0, 2])   # GT..AG
    return (np.array(cdna, dtype=np.uint8), np.array(genome, dtype=np.uint8))


def gen_jobs(seed, n):
    rng = np.random.default_rng(seed)
    jobs = []
    for i in range(n):
        qseq, tseq = make_spliced(rng, n_exons=int(rng.integers(2, 4)))
        fl = int(rng.choice([
            K.KSW_EZ_SPLICE_FOR,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_SPLICE_FLANK,
            K.KSW_EZ_SPLICE_REV,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_RIGHT,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_APPROX_MAX,
            K.KSW_EZ_SPLICE_FOR | K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_REV_CIGAR,
        ]))
        jobs.append(dict(qseq=qseq, tseq=tseq, zdrop=int(rng.choice([200, 400])),
                         end_bonus=-1, flag=fl, w=-1))
    return jobs


def check(jobs, scoring=(2, 1, 32, 9, 1, 2)):
    q, e, q2, noncan, a, b = scoring
    mat = K.gen_simple_mat(5, a, b)
    got = KP.exts2_batch(jobs, mat, q, e, q2, noncan, interpret=True)
    for j, (job, g) in enumerate(zip(jobs, got)):
        want = exts2(job["qseq"], job["tseq"], mat, q, e, q2, noncan,
                     job["zdrop"], job["flag"])
        gt = (g.score, g.max, g.zdropped, g.max_q, g.max_t, g.mqe, g.mqe_t,
              g.mte, g.mte_q, g.cigar)
        wt = (want.score, want.max, want.zdropped, want.max_q, want.max_t,
              want.mqe, want.mqe_t, want.mte, want.mte_q, want.cigar)
        assert gt == wt, (f"job {j} flag={job['flag']} "
                          f"qlen={len(job['qseq'])} tlen={len(job['tseq'])}"
                          f"\ngot ={gt}\nwant={wt}")


@pytest.mark.slow
def test_exts2_pallas_splice_scoring():
    check(gen_jobs(0, 8))


@pytest.mark.slow
def test_exts2_pallas_mixed_sizes():
    jobs = gen_jobs(1, 4)
    rng = np.random.default_rng(2)
    # plus divergent pairs that zdrop, and a tiny one
    t = rng.integers(0, 4, 300).astype(np.uint8)
    qv = rng.integers(0, 4, 280).astype(np.uint8)
    jobs.append(dict(qseq=qv, tseq=t, zdrop=100, end_bonus=-1,
                     flag=K.KSW_EZ_SPLICE_FOR, w=-1))
    jobs.append(dict(qseq=t[:9].copy(), tseq=t[:12].copy(), zdrop=200,
                     end_bonus=-1, flag=K.KSW_EZ_SPLICE_FOR, w=-1))
    check(jobs)
