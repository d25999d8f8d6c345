"""The on-chip backtrack walker must produce exactly the host-decoded
CIGARs (same p bytes, same state machine, same aliasing)."""
import numpy as np
import pytest

from minimap2_chaindp_tpu.ops import ksw2 as K
from minimap2_chaindp_tpu.ops import ksw2_pallas as KP


def _cmp(jobs, scoring=(4, 2, 24, 1, 2, 4)):
    q, e, q2, e2, a, b = scoring
    mat = K.gen_simple_mat(5, a, b)
    host = KP.extd2_batch(jobs, mat, q, e, q2, e2, interpret=True,
                          backtrack="host")
    dev = KP.extd2_batch(jobs, mat, q, e, q2, e2, interpret=True,
                         backtrack="device")
    for j, (h, d) in enumerate(zip(host, dev)):
        assert (h.score, h.zdropped, h.reach_end) == \
            (d.score, d.zdropped, d.reach_end), f"job {j}"
        assert h.cigar == d.cigar, (f"job {j} flag={jobs[j]['flag']}\n"
                                    f"host={h.cigar}\ndev ={d.cigar}")


@pytest.mark.slow
def test_backtrack_device_extd2():
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_ksw2_pallas import gen_jobs
    _cmp(gen_jobs(0, 16))


@pytest.mark.slow
def test_backtrack_device_extd2_small_and_zdrop():
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_ksw2_pallas import gen_jobs, mut
    rng = np.random.default_rng(9)
    jobs = gen_jobs(5, 4, tlen_rng=(10, 60))
    t = rng.integers(0, 4, 400).astype(np.uint8)
    jobs.append(dict(qseq=rng.integers(0, 4, 380).astype(np.uint8), tseq=t,
                     w=100, zdrop=100, end_bonus=-1,
                     flag=K.KSW_EZ_EXTZ_ONLY))
    _cmp(jobs)


@pytest.mark.slow
def test_backtrack_device_exts2():
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_ksw2_splice_pallas import gen_jobs as gen_splice
    jobs = gen_splice(2, 8)
    q, e, q2, noncan = 2, 1, 32, 9
    mat = K.gen_simple_mat(5, 1, 2)
    host = KP.exts2_batch(jobs, mat, q, e, q2, noncan, interpret=True,
                          backtrack="host")
    dev = KP.exts2_batch(jobs, mat, q, e, q2, noncan, interpret=True,
                         backtrack="device")
    for j, (h, d) in enumerate(zip(host, dev)):
        assert h.cigar == d.cigar, f"job {j}"
        assert h.score == d.score
