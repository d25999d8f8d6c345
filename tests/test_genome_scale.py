"""Genome-scale gate (VERDICT item 3, CI-sized): build a repeat-seeded
multi-contig genome well past the bundled 16.5 kb mitochondrion, map
simulated long reads, and require (a) fast-path == staged byte identity
and (b) 100% Q60 accuracy against the simulation truth (the reference's
own mapeval strategy, SURVEY §4.5). The full 50 Mb run with index-build
time / peak RSS / reads-per-second lives in tools/genome_scale.py and
PERF.md."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    import genome_scale as G
    d = tmp_path_factory.mktemp("gs")
    ref = str(d / "g6.fa")
    G.make_genome(ref, n_contigs=3, contig_len=2_000_000, seed=7)
    ont = str(d / "ont.fa")
    G.simulate(ref, ont, 60, 8000, 0.10, seed=8)
    return ref, ont


def _cli(args, env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, "-m", "minimap2_chaindp_tpu.cli", "--device",
         "host", *args], capture_output=True, text=True, cwd=ROOT, env=env,
        check=True)
    return [l for l in out.stdout.split("\n") if not l.startswith("@")]


def test_genome_scale_identity_and_accuracy(genome):
    ref, ont = genome
    fast = _cli(["-ax", "map-ont", "-t", "4", ref, ont])
    staged = _cli(["-ax", "map-ont", ref, ont],
                  {"MM2TPU_NATIVE_SKELETON": "0"})
    assert fast == staged, "fast-path vs staged mismatch at genome scale"
    wrong = n_q60 = 0
    for l in fast:
        t = l.split("\t")
        if len(t) < 11:
            continue
        if int(t[1]) & 0x904:
            continue
        truth_name, st = t[0].split("!")[1], int(t[0].split("!")[2])
        if int(t[4]) >= 60:
            n_q60 += 1
            if t[2] != truth_name or abs(int(t[3]) - st) > 20000:
                wrong += 1
    assert n_q60 >= 50      # nearly every read confidently placed
    assert wrong == 0       # 100% Q60 correctness on simulation truth
