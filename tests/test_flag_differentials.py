"""Byte-identity vs the reference binary across rarely-exercised option
combinations (strand filters, secondary suppression, intron bounds, batch
splits, output variants)."""
import os
import subprocess
import sys

import pytest

from conftest import REF_TEST_DIR

REF_BIN = "/root/repo/.golden/minimap2_ref"
MT = os.path.join(REF_TEST_DIR, "MT-human.fa")
ORANG = os.path.join(REF_TEST_DIR, "MT-orang.fa")
TINV = os.path.join(REF_TEST_DIR, "t-inv.fa")
QINV = os.path.join(REF_TEST_DIR, "q-inv.fa")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_BIN),
                                reason="reference binary not built")


def compare(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    ours = subprocess.run(
        [sys.executable, "-m", "minimap2_chaindp_tpu.cli", "--device",
         "host", *args],
        capture_output=True, text=True, check=True, cwd="/root/repo", env=env)
    ref = subprocess.run([REF_BIN, "-t", "12", *args],
                         capture_output=True, text=True, check=True)
    strip = lambda t: [l for l in t.split("\n") if not l.startswith("@PG")]
    assert strip(ours.stdout) == strip(ref.stdout)


@pytest.mark.parametrize("args", [
    ["--for-only", "-c", TINV, QINV],
    ["--rev-only", "-c", TINV, QINV],
    ["--secondary=no", "-a", TINV, QINV],
    ["-p", "0.5", "-N", "10", "-c", QINV, QINV],
    ["-G", "5k", "-ax", "splice", TINV, QINV],
    ["-L", "-a", MT, ORANG],
    ["-K", "20k", "-c", TINV, QINV],
    ["-f", "0.001", "-c", MT, ORANG],
    ["-r", "100", "-a", TINV, QINV],
    ["-g", "1000", "-c", MT, ORANG],
], ids=["for-only", "rev-only", "secondary-no", "pri-ratio-bestn",
        "intron-G", "long-cigar-L", "tiny-K", "mid-occ-frac", "small-bw",
        "max-gap"])
def test_flag_differential(args):
    compare(args)
