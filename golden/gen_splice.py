#!/usr/bin/env python
"""Generate the splice-preset e2e fixture: a synthetic 2-gene genome with
GT..AG introns and cDNA queries (exon concatenations with point errors),
plus the reference binary's `-ax splice` output as the golden file.

Run from the repo root:  python golden/gen_splice.py
"""
import os
import subprocess

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")
GOLD = os.path.join(ROOT, "tests", "golden")
REF_BIN = os.path.join(ROOT, ".golden", "minimap2_ref")

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(BASES[rng.integers(0, 4, n)])


def make_gene(rng, n_exons, exon_lo=120, exon_hi=300, intron_lo=200, intron_hi=900):
    exons, genome_parts = [], []
    for i in range(n_exons):
        ex = rand_seq(rng, int(rng.integers(exon_lo, exon_hi)))
        exons.append(ex)
        genome_parts.append(ex)
        if i != n_exons - 1:
            ilen = int(rng.integers(intron_lo, intron_hi))
            intron = "GT" + rand_seq(rng, ilen - 4) + "AG"
            genome_parts.append(intron)
    return "".join(genome_parts), "".join(exons)


def mutate(rng, seq, rate=0.02):
    out = []
    for c in seq:
        if rng.random() < rate:
            out.append(str(BASES[rng.integers(0, 4)]))
        else:
            out.append(c)
    return "".join(out)


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main():
    rng = np.random.default_rng(42)
    flank = rand_seq(rng, 1500)
    g1, c1 = make_gene(rng, 4)
    mid = rand_seq(rng, 2000)
    g2, c2 = make_gene(rng, 3)
    tail = rand_seq(rng, 1500)
    genome = flank + g1 + mid + g2 + tail

    queries = [
        ("cdna1", mutate(rng, c1)),
        ("cdna2", mutate(rng, c2)),
        ("cdna1_rev", revcomp(mutate(rng, c1))),   # antisense read of gene 1
        ("cdna2_part", mutate(rng, c2)[40:-40]),   # truncated ends
    ]

    os.makedirs(DATA, exist_ok=True)
    gfa = os.path.join(DATA, "splice_genome.fa")
    qfa = os.path.join(DATA, "splice_cdna.fa")
    with open(gfa, "w") as f:
        f.write(">chrS\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    with open(qfa, "w") as f:
        for name, seq in queries:
            f.write(f">{name}\n{seq}\n")

    for mode, out in (("-ax", "splice.sam"), ("-cx", "splice.paf")):
        r = subprocess.run([REF_BIN, mode, "splice", "-t", "12", gfa, qfa],
                           capture_output=True, text=True, check=True)
        with open(os.path.join(GOLD, out), "w") as f:
            f.write(r.stdout)
        print(out, len(r.stdout.splitlines()), "lines")


if __name__ == "__main__":
    main()
