#!/usr/bin/env python
"""Co-located fused-flow projection (VERDICT r4 #2).

The tunnel forbids measuring a co-located deployment directly, so this
tool measures the two quantities a co-located pipeline is built from and
derives the projection the reference's own FPGA-on-PCIe posture implies
(fpga.h:41-62 — the accelerator sits next to the host):

1. ON-CHIP per-read time of the fused collect+chain step: inputs are
   device_put up front (H2D excluded), `--iters` whole-bucket dispatches
   are pipelined back-to-back, and only the LAST dispatch's tiny flag
   column is fetched (device execution serializes per stream, so that
   fetch bounds them all; D2H excluded).  This is the chain-bench
   methodology applied to the full fused step.
2. The HOST path's per-read cost and its stage split (MM2TPU_PROF native
   counters: sketch/collect/chain/finish/text), giving the RESIDUAL the
   host keeps when collect+chain move on-chip.

Projection: a co-located 1-core pipeline overlaps device exec with the
host residual, so projected reads/s = 1000 / max(flow_ms, residual_ms);
PCIe-class transfer (~16 GB/s) adds microseconds per read and is
reported for completeness.  Run on the real TPU; --interpret exists only
for plumbing tests (its timings measure the CPU interpreter, not the
chip).

Usage:
  MM2TPU_PROF=1 python tools/flow_projection.py [--lengths 1000,3000,10000,20000]
      [--reads 64] [--iters 3] [--json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PCIE_GBPS = 16.0   # PCIe4 x16-class host<->accelerator link


def build_ref(tmp="/tmp/flow_proj"):
    import genome_scale as G
    os.makedirs(tmp, exist_ok=True)
    ref = os.path.join(tmp, "g6.fa")
    if not os.path.exists(ref):
        G.make_genome(ref, n_contigs=3, contig_len=2_000_000, seed=7)
    return ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="1000,3000,10000,20000")
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--preset", default="map-ont")
    ap.add_argument("--ref", default=None,
                    help="simulate reads from this FASTA instead of the "
                         "built-in 6 Mb genome")
    ap.add_argument("--index", default=None,
                    help="prebuilt .mm2i to project against (e.g. the "
                         "3 Gbp map-pb index); --ref supplies the read "
                         "source")
    args = ap.parse_args()
    os.environ.setdefault("MM2TPU_PROF", "1")

    from minimap2_chaindp_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax
    if args.interpret:
        try:   # the env pre-imports jax; flip the backend before first use
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import genome_scale as G
    from minimap2_chaindp_tpu import constants as C, native
    from minimap2_chaindp_tpu.index.build import build_index
    from minimap2_chaindp_tpu.io.fastx import read_fastx
    from minimap2_chaindp_tpu.models.device_flow import (
        CAP_BUCKETS, M_BUCKETS, DeviceFlow, host_seed_stats)
    from minimap2_chaindp_tpu.models.pipeline import prepare_frag, seed_unit
    from minimap2_chaindp_tpu.ops import chain_pallas as CP
    from minimap2_chaindp_tpu.options import set_opt

    dev = jax.devices()[0]
    interpret = args.interpret or dev.platform == "cpu"
    ref = args.ref or build_ref()
    io_, mo = set_opt(args.preset)
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    if args.index:
        from minimap2_chaindp_tpu.index.serialize import load_index
        mi = load_index(args.index)
    else:
        refs = list(read_fastx(ref))
        mi = build_index([r.name for r in refs], [r.seq for r in refs],
                         io_.w, io_.k, io_.flag, io_.bucket_bits)
    mo.update(mi)
    flow = DeviceFlow(mi, mo, interpret=interpret, ship_anchors=True)

    out = {"device": str(dev), "link_excluded": True,
           "pcie_gbps": PCIE_GBPS, "per_length": {}}
    os.makedirs("/tmp/flow_proj", exist_ok=True)
    for L in [int(x) for x in args.lengths.split(",")]:
        qpath = f"/tmp/flow_proj/reads_{os.path.basename(ref)}_{L}.fa"
        if not os.path.exists(qpath):
            G.simulate(ref, qpath, args.reads, L, 0.10, seed=11)
        segs = list(read_fastx(qpath))
        units, stats, drops = [], [], 0
        for s in segs:
            _w, _f, us = prepare_frag(mo, [s])
            info = seed_unit(mi, mo, us[0], collect_hits=False)
            if info.mv is None or not len(info.mv):
                drops += 1
                continue
            n, span_sum, over, pos, occ = host_seed_stats(mi, info.mv,
                                                          mo.mid_occ)
            if n == 0 or len(info.mv) > M_BUCKETS[-1] \
                    or n > CAP_BUCKETS[-1]:
                drops += 1
                continue
            avg = np.float32(span_sum) / np.float32(n)
            if avg < 1.6:
                drops += 1
                continue
            w1, excl = CP.clin_slope_exc(avg)
            if excl is None:
                drops += 1
                continue
            units.append((us[0], info))
            stats.append((n, over, pos, occ, w1, excl))
        if not units:
            out["per_length"][L] = {"error": "no eligible reads"}
            continue
        mb = next(m for m in M_BUCKETS
                  if all(len(u[1].mv) <= m for u in units))
        cb = next(c for c in CAP_BUCKETS
                  if all(st[0] <= c for st in stats))
        gq = units[0][1].gap_qry
        gr = units[0][1].gap_ref
        R = 8
        while R < len(units):
            R *= 2
        max_qlen = max(u[1].qlen_sum for u in units)
        qposidx = np.full((R, mb), -1, np.int32)
        qp_dt = np.int16 if 2 * max_qlen + 1 <= 32767 else np.int32
        qpos = np.zeros((R, mb), qp_dt)
        qspan8 = np.zeros((R, mb), np.uint8)
        qls = np.zeros((R, 1), np.int32)
        nn = np.zeros((R, CP.LANES), np.int32)
        w1a = np.zeros((R, CP.LANES), np.float32)
        exca = np.full((R, CP.LANES), -1, np.int32)
        n_anchors = 0
        for r, ((u, info), (n, over, pos, occ, w1, excl)) in enumerate(
                zip(units, stats)):
            mv = info.mv
            nmv = len(mv)
            found = (occ > 0) | over
            qposidx[r, :nmv] = np.where(found, pos, -1)
            qpos[r, :nmv] = (mv[:, 1] & np.uint64(0xFFFFFFFF)).astype(
                np.int64)
            qspan8[r, :nmv] = (mv[:, 0] & np.uint64(0xFF)).astype(np.int64)
            qls[r, 0] = info.qlen_sum
            nn[r, 0] = n
            w1a[r, 0] = w1
            for j, (dd, val) in enumerate(excl):
                exca[r, 2 * j] = dd
                exca[r, 2 * j + 1] = val
            n_anchors += n
        use_exc = CP.infer_use_exc(exca)
        score_bound = 32511 if max_qlen + 512 <= 32511 else (1 << 30)
        dx = flow.dx
        dargs = [dx.starts, dx.vhi, dx.vlo]
        dargs += [jax.device_put(a) for a in (qposidx, qpos, qspan8)]
        import jax.numpy as jnp
        mid = jnp.int32(mo.mid_occ)
        dargs2 = [jax.device_put(a) for a in (qls, nn, w1a, exca)]
        jax.block_until_ready(dargs[3:] + dargs2)

        def dispatch():
            return flow._flow(*dargs[:3], *dargs[3:], mid, *dargs2,
                              cap=cb, max_dist_x=gr, max_dist_y=gq,
                              bw=mo.bw, max_skip=mo.max_chain_skip,
                              use_exc=use_exc, score_bound=score_bound,
                              ship_anchors=True)

        o = dispatch()                       # compile + warm
        jax.block_until_ready(o)
        o = dispatch()
        jax.block_until_ready(o)
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            outs = [dispatch() for _ in range(args.iters)]
            np.asarray(outs[-1][-1][:, :1])  # flag column of the LAST
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        flow_ms = best * 1000.0 / (args.iters * len(units))

        # host path + stage split on the same reads
        native.prof_reset()
        native.map_batch_text_native(mi, mo, segs, "")   # warm
        native.prof_reset()
        t0 = time.perf_counter()
        native.map_batch_text_native(mi, mo, segs, "")
        host_ms = (time.perf_counter() - t0) * 1000.0 / len(segs)
        prof = native.prof_read() or {}
        repl_ms = (prof.get("collect", 0) + prof.get("chain", 0)) \
            / 1e6 / len(segs)
        resid_ms = max(host_ms - repl_ms, 1e-6)
        apr = n_anchors / len(units)
        # per-read bytes a co-located link would move for this step
        xfer_b = 2.0 * mb / 1024 * 1024 + 18.0 * apr
        pcie_us = xfer_b / (PCIE_GBPS * 1e3)
        proj = 1000.0 / max(flow_ms, resid_ms)
        out["per_length"][L] = {
            "n_reads": len(units), "dropped": drops,
            "anchors_per_read": round(apr, 1),
            "flow_device_ms_per_read": round(flow_ms, 4),
            "host_ms_per_read": round(host_ms, 3),
            "host_replaced_ms_per_read": round(repl_ms, 3),
            "host_residual_ms_per_read": round(resid_ms, 3),
            "pcie_transfer_us_per_read": round(pcie_us, 1),
            "projected_colocated_reads_per_s_1core": round(proj, 1),
            "measured_host_reads_per_s_1core": round(1000.0 / host_ms, 1),
        }
        if not args.json:
            r = out["per_length"][L]
            print(f"L={L}: flow {r['flow_device_ms_per_read']} ms/read "
                  f"on-chip | host {r['host_ms_per_read']} ms/read "
                  f"(replaced {r['host_replaced_ms_per_read']}, residual "
                  f"{r['host_residual_ms_per_read']}) | pcie "
                  f"{r['pcie_transfer_us_per_read']} us | projected "
                  f"{r['projected_colocated_reads_per_s_1core']} vs host "
                  f"{r['measured_host_reads_per_s_1core']} reads/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
