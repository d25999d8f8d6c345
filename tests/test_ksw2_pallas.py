"""Validate the Pallas extd2 wavefront kernel bit-exactly against the NumPy
golden model (ops/ksw2.py, itself validated against the reference C kernels).
Runs in interpret mode on the CPU test mesh; the same kernel compiles for TPU."""
import numpy as np
import pytest

from minimap2_chaindp_tpu.ops import ksw2 as K
from minimap2_chaindp_tpu.ops import ksw2_pallas as KP


def mut(rng, seq, sub=0.08, ind=0.04):
    out = []
    for c in seq:
        r = rng.random()
        if r < sub:
            out.append(rng.integers(0, 4))
        elif r < sub + ind / 2:
            pass
        elif r < sub + ind:
            out.append(c)
            for _ in range(int(rng.integers(1, 12))):
                out.append(rng.integers(0, 4))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def gen_jobs(seed, n, tlen_rng=(20, 300)):
    rng = np.random.default_rng(seed)
    jobs = []
    for _ in range(n):
        tlen = int(rng.integers(*tlen_rng))
        tseq = rng.integers(0, 4, tlen).astype(np.uint8)
        qseq = mut(rng, tseq)
        if len(qseq) == 0:
            qseq = np.array([0], dtype=np.uint8)
        w = int(rng.choice([25, 100, 751]))
        zdrop = int(rng.choice([100, 400]))
        flag = int(rng.choice([
            0,
            K.KSW_EZ_APPROX_MAX,
            K.KSW_EZ_EXTZ_ONLY,
            K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT,
            K.KSW_EZ_EXTZ_ONLY | K.KSW_EZ_RIGHT | K.KSW_EZ_REV_CIGAR,
            K.KSW_EZ_APPROX_MAX | K.KSW_EZ_APPROX_DROP,
        ]))
        eb = -1 if not (flag & K.KSW_EZ_EXTZ_ONLY) else int(rng.choice([-1, 10]))
        jobs.append(dict(qseq=qseq, tseq=tseq, w=w, zdrop=zdrop,
                         end_bonus=eb, flag=flag))
    return jobs


def check(jobs, scoring=(4, 2, 24, 1, 2, 4)):
    q, e, q2, e2, a, b = scoring
    mat = K.gen_simple_mat(5, a, b)
    got = KP.extd2_batch(jobs, mat, q, e, q2, e2, interpret=True)
    for j, (job, g) in enumerate(zip(jobs, got)):
        want = K.extd2(job["qseq"], job["tseq"], mat, q, e, q2, e2,
                       job["w"], job["zdrop"], job["end_bonus"], job["flag"])
        gt = (g.score, g.max, g.zdropped, g.max_q, g.max_t, g.mqe, g.mqe_t,
              g.mte, g.mte_q, g.reach_end, g.cigar)
        wt = (want.score, want.max, want.zdropped, want.max_q, want.max_t,
              want.mqe, want.mqe_t, want.mte, want.mte_q, want.reach_end,
              want.cigar)
        assert gt == wt, (f"job {j} flag={job['flag']} w={job['w']} "
                          f"qlen={len(job['qseq'])} tlen={len(job['tseq'])}"
                          f"\ngot ={gt}\nwant={wt}")


@pytest.mark.slow
def test_extd2_pallas_default_scoring():
    check(gen_jobs(0, 16))


@pytest.mark.slow
def test_extd2_pallas_sr_scoring():
    check(gen_jobs(1, 8), scoring=(12, 2, 24, 1, 2, 8))


@pytest.mark.slow
def test_extd2_pallas_asm_scoring():
    check(gen_jobs(2, 8), scoring=(16, 2, 41, 1, 1, 9))


@pytest.mark.slow
def test_extd2_pallas_mixed_sizes():
    # jobs with very different shapes in one batch exercise the common-base
    # chunk layout and per-job done masking
    jobs = gen_jobs(3, 4, tlen_rng=(10, 60)) + gen_jobs(4, 4, tlen_rng=(300, 600))
    check(jobs)


@pytest.mark.slow
def test_extd2_pallas_tiny_and_divergent():
    rng = np.random.default_rng(5)
    jobs = []
    # unrelated sequences -> zdrop fires early
    for _ in range(4):
        t = rng.integers(0, 4, 400).astype(np.uint8)
        qv = rng.integers(0, 4, 380).astype(np.uint8)
        jobs.append(dict(qseq=qv, tseq=t, w=100, zdrop=100, end_bonus=-1,
                         flag=K.KSW_EZ_EXTZ_ONLY))
    # tiny jobs
    for _ in range(4):
        t = rng.integers(0, 4, int(rng.integers(3, 10))).astype(np.uint8)
        jobs.append(dict(qseq=mut(rng, t), tseq=t, w=25, zdrop=400,
                         end_bonus=-1, flag=0))
        if len(jobs[-1]["qseq"]) == 0:
            jobs[-1]["qseq"] = np.array([0], dtype=np.uint8)
    check(jobs)


@pytest.mark.slow
def test_extd2_width1_band_at_chunk_base():
    """Width-1 band whose aligned start lands exactly on the group's
    128-aligned chunk base: H[en0-1] sits one lane below every scanned
    chunk and must be seeded from the previous chunk — unseeded, the
    accumulator stayed NEG and H[en0] wrapped positive (observed score
    2147483582 vs golden -221 on the qlen=1, unbanded, tlen=200 job)."""
    rng = np.random.default_rng(2)
    q, e, q2, e2 = 4, 2, 24, 1
    mat = K.gen_simple_mat(5, 2, 4)
    jobs = [dict(qseq=rng.integers(0, 4, 1).astype(np.uint8),
                 tseq=rng.integers(0, 4, tlen).astype(np.uint8),
                 w=-1, zdrop=-1, end_bonus=0, flag=0)
            for tlen in (135, 200)]
    got = KP.extd2_batch(jobs, mat, q, e, q2, e2, interpret=True,
                         backtrack="host")
    for j, job in enumerate(jobs):
        ez = K.extd2(job["qseq"], job["tseq"], mat, q, e, q2, e2,
                     job["w"], job["zdrop"], job["end_bonus"], job["flag"])
        d = got[j]
        assert (ez.score, ez.mqe, ez.mte, ez.max) == \
            (d.score, d.mqe, d.mte, d.max), f"job {j}"
