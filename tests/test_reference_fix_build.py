"""Guard golden/build_reference_fix.sh: the PE-bug-fixed reference build
(golden/README.md) must keep reproducing the pinned paired-end golden
byte-identically, and must not change single-end output vs minimap2_ref.

The fork's own paired-end path segfaults (map.c:517 n_segs field bug,
align.c:597 NULL r->p on immediate Z-drop, map.c:608-631 async revcomp
race), so minimap2_fix is the PE oracle for fixtures and diff sweeps."""
import os
import subprocess

import pytest

from conftest import REF_TEST_DIR, GOLDEN_DIR

ROOT = "/root/repo"
REF_BIN = os.path.join(ROOT, ".golden", "minimap2_ref")
FIX_BIN = os.path.join(ROOT, ".golden", "minimap2_fix")
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_BIN),
                                reason="reference binary not built")


def _ensure_fix():
    if not os.path.exists(FIX_BIN):
        subprocess.run(["bash", os.path.join(ROOT, "golden",
                                             "build_reference_fix.sh")],
                       check=True, capture_output=True)


def _run(bin_, args):
    out = subprocess.run([bin_, "-t", "12", *args], capture_output=True,
                         text=True, check=True)
    return [l for l in out.stdout.split("\n") if not l.startswith("@PG")]


def test_fix_reproduces_pe_golden():
    _ensure_fix()
    got = _run(FIX_BIN, ["-ax", "sr", os.path.join(REF_TEST_DIR, "MT-human.fa"),
                         os.path.join(DATA, "pe_1.fq"),
                         os.path.join(DATA, "pe_2.fq")])
    with open(os.path.join(GOLDEN_DIR, "pe.sr.sam")) as f:
        want = [l for l in f.read().split("\n") if not l.startswith("@PG")]
    assert got == want


def test_fix_single_end_unchanged():
    _ensure_fix()
    args = ["-a", os.path.join(REF_TEST_DIR, "MT-human.fa"),
            os.path.join(REF_TEST_DIR, "MT-orang.fa")]
    assert _run(FIX_BIN, args) == _run(REF_BIN, args)
