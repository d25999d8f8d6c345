"""The native C++ sketcher (native/sketch.cc) must match the Python golden
model (index/sketch._sketch_py) bit for bit — including HPC compression,
ambiguous bases, symmetric-k-mer skips, and tie emission."""
import numpy as np
import pytest

from minimap2_chaindp_tpu.constants import SEQ_NT4_TABLE
from minimap2_chaindp_tpu.index.sketch import _sketch_py
from minimap2_chaindp_tpu.native import sketch_batch_native


def _nt4(s: str) -> np.ndarray:
    return SEQ_NT4_TABLE[np.frombuffer(s.encode(), dtype=np.uint8)]


@pytest.mark.skipif(sketch_batch_native([_nt4("ACGTACGTACGTACGTACGT")],
                                        5, 4, [0], False) is None,
                    reason="native toolchain unavailable")
def test_native_sketch_fuzz_parity():
    rng = np.random.default_rng(42)
    for trial in range(60):
        n = int(rng.integers(25, 2500))
        seq = rng.choice(list("ACGTN"), size=n,
                         p=[0.24, 0.24, 0.24, 0.24, 0.04])
        if trial % 3 == 0:  # homopolymer runs exercise the HPC queue
            for _ in range(4):
                p = int(rng.integers(0, n - 12))
                seq[p:p + int(rng.integers(2, 11))] = seq[p]
        s = "".join(seq)
        nt4 = _nt4(s)
        for hpc in (False, True):
            w = int(rng.integers(1, 30))
            k = int(rng.integers(4, 29))
            ref = _sketch_py(nt4, n, w, k, 7, hpc)
            got = sketch_batch_native([nt4], w, k, [7], hpc)[0]
            assert ref.shape == got.shape and np.array_equal(ref, got), \
                (trial, w, k, hpc)


def test_native_sketch_batch_offsets():
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 400))))
            for _ in range(9)] + ["ACG"]  # one shorter-than-k tail
    nt4s = [_nt4(s) for s in seqs]
    rids = list(range(len(seqs)))
    got = sketch_batch_native(nt4s, 10, 15, rids, False)
    if got is None:
        pytest.skip("native toolchain unavailable")
    for s, nt4, rid, g in zip(seqs, nt4s, rids, got):
        ref = _sketch_py(nt4, len(s), 10, 15, rid, False)
        assert np.array_equal(ref, g)

def test_native_sketch_extreme_params():
    """Boundary w/k, tie-storm alphabets, N-heavy input and long homopolymer
    runs (span >= 256 with big k under HPC) — the emission-event edge cases
    of the slot-stream/window decomposition in native/sketch.cc."""
    rng = np.random.default_rng(123)
    if sketch_batch_native([_nt4("ACGTACGTACGTACGTACGT")],
                           5, 4, [0], False) is None:
        pytest.skip("native toolchain unavailable")
    for trial in range(60):
        n = int(rng.integers(5, 3000))
        mode = trial % 5
        if mode == 0:
            seq = rng.choice(list("ACGTN"), size=n, p=[.24, .24, .24, .24, .04])
        elif mode == 1:
            seq = rng.choice(list("AC"), size=n)      # tie storms
        elif mode == 2:
            seq = rng.choice(list("AT"), size=n)      # symmetric-kmer rich
        elif mode == 3:
            seq = rng.choice(list("ACGT"), size=n)
            for _ in range(6):
                p = int(rng.integers(0, max(1, n - 40)))
                seq[p:p + int(rng.integers(5, 40))] = seq[p]
        else:
            seq = rng.choice(list("ACGTN"), size=n, p=[.2, .2, .2, .2, .2])
        nt4 = _nt4("".join(seq))
        for hpc in (False, True):
            w = int(rng.choice([1, 2, 3, 5, 10, 19, 50, 128, 255]))
            k = int(rng.choice([1, 2, 3, 4, 7, 15, 19, 28]))
            ref = _sketch_py(nt4, n, w, k, 7, hpc)
            got = sketch_batch_native([nt4], w, k, [7], hpc)[0]
            assert ref.shape == got.shape and np.array_equal(ref, got), \
                (trial, w, k, hpc)
