#!/usr/bin/env python
"""Minimal library-API consumer — the analog of the reference's example.c
(index build + per-read map + PAF-ish print, example.c:12-61).

Usage: python examples/example.py <target.fa> <query.fa>
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from minimap2_chaindp_tpu import mappy as mp


def main() -> int:
    if len(sys.argv) < 3:
        print("Usage: example.py <target.fa> <query.fa>", file=sys.stderr)
        return 1
    a = mp.Aligner(sys.argv[1])           # index build (mm_idx_reader loop)
    if not a:
        raise SystemExit("failed to load/build index")
    for name, seq, qual in mp.fastx_read(sys.argv[2]):
        for h in a.map(seq, name=name):   # mm_map per read
            print("\t".join(map(str, (
                name, len(seq), h.q_st, h.q_en, "+-"[h.strand < 0],
                h.ctg, h.ctg_len, h.r_st, h.r_en, h.mlen, h.blen, h.mapq))))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
