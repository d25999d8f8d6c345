"""-t worker-pool parity: multi-threaded mapping and index build must be
byte-identical to single-threaded output with ordered results (the
reference's kt_for over fragments, kthread.c:125/145, and the index
build's step-1 parallel sketching, index.c:506-517)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REF_TEST_DIR

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _cli(args):
    out = subprocess.run(
        [sys.executable, "-m", "minimap2_chaindp_tpu.cli", "--device",
         "host", *args], capture_output=True, text=True, cwd=ROOT,
        check=True)
    return [l for l in out.stdout.split("\n") if not l.startswith("@PG")]


def _simreads(path, n, read_len, seed):
    rng = np.random.default_rng(seed)
    from minimap2_chaindp_tpu.io.fastx import read_fastx
    ref = next(read_fastx(f"{REF_TEST_DIR}/MT-human.fa")).seq
    comp = str.maketrans("ACGT", "TGCA")
    with open(path, "w") as f:
        for i in range(n):
            st = int(rng.integers(0, len(ref) - read_len))
            s = "".join(c if rng.random() > 0.08
                        else "ACGT"[int(rng.integers(0, 4))]
                        for c in ref[st:st + read_len])
            if rng.random() < 0.5:
                s = s[::-1].translate(comp)
            f.write(f">t{i}\n{s}\n")


def test_threads_single_end_identity(tmp_path):
    q = str(tmp_path / "q.fa")
    _simreads(q, 60, 800, seed=3)
    ref = f"{REF_TEST_DIR}/MT-human.fa"
    one = _cli(["-a", "-t", "1", ref, q])
    four = _cli(["-a", "-t", "4", ref, q])
    assert one == four
    assert len([l for l in one if l and not l.startswith("@")]) >= 50


def test_threads_paired_end_identity():
    ref = f"{REF_TEST_DIR}/MT-human.fa"
    p1 = os.path.join(DATA, "pe_1.fq")
    p2 = os.path.join(DATA, "pe_2.fq")
    one = _cli(["-ax", "sr", "-t", "1", ref, p1, p2])
    four = _cli(["-ax", "sr", "-t", "4", ref, p1, p2])
    assert one == four


def test_threads_index_build_identity():
    from minimap2_chaindp_tpu.index.build import build_index
    from minimap2_chaindp_tpu.io.fastx import read_fastx
    rng = np.random.default_rng(11)
    names, seqs = [], []
    for i in range(7):  # deliberately not a multiple of the pool size
        n = int(rng.integers(2000, 9000))
        names.append(f"c{i}")
        seqs.append("".join("ACGT"[b] for b in rng.integers(0, 4, n)))
    a = build_index(names, seqs, 10, 15, 0, 14, n_threads=1)
    b = build_index(names, seqs, 10, 15, 0, 14, n_threads=4)
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.starts, b.starts)
    assert np.array_equal(a.values, b.values)
