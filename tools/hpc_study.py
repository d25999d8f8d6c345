#!/usr/bin/env python
"""map-pb (HPC) vs map-ont at genome scale (VERDICT r4 #6): build both
indexes over the same genome, map the same PacBio-like reads through the
batched native driver with MM2TPU_PROF stage counters, and print the
per-stage ms/read side by side so the 3x gap PERF.md reported at 3 Gbp
gets a named cause.  The build pass doubles as the spill-build
measurement (VERDICT r4 #7): at 3 Gbp the auto-spill threshold engages
(index/build.py) and peak RSS + wall time are printed per build.

Usage:  MM2TPU_PROF=1 python tools/hpc_study.py [--mb 3000] [--reads 150]
        [--dir /tmp/genome_scale] [--spill auto|0|1]
"""
import argparse
import os
import resource
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def peak_rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=3000)
    ap.add_argument("--reads", type=int, default=150)
    ap.add_argument("--read-len", type=int, default=10000)
    ap.add_argument("--dir", default="/tmp/genome_scale")
    ap.add_argument("--spill", default="auto", choices=["auto", "0", "1"])
    ap.add_argument("--presets", default="map-pb,map-ont")
    args = ap.parse_args()
    os.environ.setdefault("MM2TPU_PROF", "1")
    if args.spill != "auto":
        os.environ["MM2TPU_BUILD_SPILL"] = args.spill

    import genome_scale as G
    from minimap2_chaindp_tpu import native
    from minimap2_chaindp_tpu import constants as C
    from minimap2_chaindp_tpu.constants import seq_to_nt4
    from minimap2_chaindp_tpu.index.build import build_index
    from minimap2_chaindp_tpu.io.fastx import read_fastx
    from minimap2_chaindp_tpu.options import set_opt

    os.makedirs(args.dir, exist_ok=True)
    ref = os.path.join(args.dir, f"genome{args.mb}.fa")
    if not os.path.exists(ref):
        dt = G.make_genome(ref, n_contigs=max(1, args.mb // 2))
        print(f"[genome] {args.mb} Mb synthesized in {dt:.1f}s", flush=True)
    pb = os.path.join(args.dir, f"pbstudy{args.mb}.fa")
    if not os.path.exists(pb):
        G.simulate(ref, pb, args.reads, args.read_len, 0.12, seed=6)

    for preset in args.presets.split(","):
        io_, mo = set_opt(preset)
        mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
        rss0 = peak_rss_mb()
        t0 = time.perf_counter()
        names, seqs = [], []
        for r in read_fastx(ref):
            names.append(r.name)
            seqs.append(seq_to_nt4(r.seq))
        mi = build_index(names, seqs, io_.w, io_.k, io_.flag,
                         io_.bucket_bits)
        t_idx = time.perf_counter() - t0
        del names, seqs
        occ = np.diff(mi.starts)
        print(f"[{preset}] build {t_idx:.1f}s  w={io_.w} k={io_.k} "
              f"hpc={bool(io_.flag & 1)}  {len(mi.keys) / 1e6:.1f}M keys "
              f"/ {len(mi.values) / 1e6:.1f}M positions  peak RSS "
              f"{peak_rss_mb():.0f} MB (session floor {rss0:.0f})",
              flush=True)
        print(f"[{preset}] occ dist: mean {occ.mean():.2f}  "
              f"p99 {int(np.percentile(occ, 99))}  max {int(occ.max())}",
              flush=True)
        mo.update(mi)
        print(f"[{preset}] mid_occ={mo.mid_occ}", flush=True)
        segs = list(read_fastx(pb))
        native.map_batch_text_native(mi, mo, segs[:8], "")     # warm
        native.prof_reset()
        t0 = time.perf_counter()
        out = native.map_batch_text_native(mi, mo, segs, "")
        dt = time.perf_counter() - t0
        assert out is not None and len(out) == len(segs)
        prof = native.prof_read() or {}
        n = len(segs)
        split = {k: round(v / 1e6 / n, 3) for k, v in prof.items()}
        print(f"[{preset}] map {n} reads: {n / dt:.1f} reads/s "
              f"({dt * 1000 / n:.2f} ms/read)  stage ms/read: {split}",
              flush=True)
        cp = native.collect_prof_read() or {}
        print(f"[{preset}] collect split ms/read: "
              f"{ {k: round(v / 1e6 / n, 3) for k, v in cp.items()} }",
              flush=True)
        # seed-stat shape: anchors per read under this preset's index
        from minimap2_chaindp_tpu.models.device_flow import host_seed_stats
        from minimap2_chaindp_tpu.models.pipeline import (prepare_frag,
                                                          seed_unit)
        n_anch = []
        for s in segs[:40]:
            _w, _f, us = prepare_frag(mo, [s])
            info = seed_unit(mi, mo, us[0], collect_hits=False)
            if info.mv is not None and len(info.mv):
                na, _ss, _ov, _p, _o = host_seed_stats(mi, info.mv,
                                                       mo.mid_occ)
                n_anch.append(na)
        if n_anch:
            print(f"[{preset}] anchors/read: mean {np.mean(n_anch):.0f} "
                  f"p90 {np.percentile(n_anch, 90):.0f} "
                  f"max {max(n_anch)}", flush=True)
        del mi, mo, segs, out


if __name__ == "__main__":
    main()
