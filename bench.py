#!/usr/bin/env python
"""Headline benchmark: chaining-DP throughput (anchors/s) of the Pallas kernel
on the attached TPU vs the reference's single-core chain.c (mm_chain_dp_fpga).

Prints ONE JSON line:
  {"metric": "chaindp_anchors_per_s", "value": N, "unit": "anchors/s",
   "vs_baseline": N / single_core_reference_anchors_per_s, ...}
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# 8192 reads per dispatch: the kernel's per-call cost on this
# tunnel-attached device includes a ~24 ms host<->device round trip that a
# co-located host would not pay; a larger batch amortizes it so the metric
# tracks the chip, not the link (measured: 1024-read calls ~37 ms, 4096-read
# ~76 ms, 8192-read ~123 ms => ~80M anchors/s on-chip + ~24 ms fixed)
N_READS = int(os.environ.get("MM2TPU_BENCH_READS", "8192"))
ANCHORS_PER_READ = 1024
MAX_DIST = 5000
BW = 500
MAX_SKIP = 25
MIN_SC = 40


def baseline_anchors_per_s(reads):
    """Single-core reference chain.c throughput via the golden build.

    Stabilized (VERDICT r4 #4): each repeat loops the 64-read workload
    for a FIXED >=3 s work budget (chain_bench.c argv[6]) so the 1-core
    host's scheduler bursts average out — the old single ~40 ms pass
    swung the round-headline denominator 1.26M -> 2.43M anchors/s
    between rounds. Returns (best, {min, median, max, n}) or None."""
    root = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(root, ".golden", "chain_bench")
    src = os.path.join(root, "golden", "chain_bench.c")
    if (not os.path.exists(bench)
            or os.path.getmtime(bench) < os.path.getmtime(src)):
        try:
            subprocess.run(["bash", os.path.join(root, "golden", "build_reference.sh")],
                           check=True, capture_output=True)
            subprocess.run(
                ["gcc", "-O2", "-std=gnu99", "-DHAVE_KALLOC", "-I/root/reference",
                 src,
                 os.path.join(root, ".golden", "chain.o"),
                 os.path.join(root, ".golden", "kalloc.o"),
                 os.path.join(root, ".golden", "misc.o"),
                 "-o", bench, "-lm", "-lz", "-lpthread"],
                check=True, capture_output=True)
        except Exception:
            return None
    sub = reads[:64]
    lines = [str(len(sub))]
    for a in sub:
        lines.append(str(len(a)))
        lines.extend(f"{int(x):x} {int(y):x}" for x, y in a)
    budget_s = float(os.environ.get("MM2TPU_BASELINE_BUDGET_S", "3"))
    rates = []
    for _ in range(3):
        out = subprocess.run(
            [bench, str(MAX_DIST), str(MAX_DIST), str(BW), str(MAX_SKIP),
             str(MIN_SC), str(budget_s)],
            input="\n".join(lines), capture_output=True, text=True,
            check=True)
        total, secs = out.stdout.split()
        rates.append(int(total) / float(secs))
    rates.sort()
    spread = {"min": round(rates[0], 1),
              "median": round(rates[len(rates) // 2], 1),
              "max": round(rates[-1], 1), "n": len(rates),
              "budget_s": budget_s}
    return rates[-1], spread


def host_native_fallback():
    """Device unreachable: measure the framework's exact native host
    chaining path on the same workload so the driver still gets an honest
    number (clearly labeled)."""
    from minimap2_chaindp_tpu.native import chain_dp_native
    from minimap2_chaindp_tpu.utils.synth import synth_batch
    anchors = synth_batch(64, ANCHORS_PER_READ, seed=1)
    if chain_dp_native(MAX_DIST, MAX_DIST, BW, MAX_SKIP, 3, MIN_SC,
                       False, 1, anchors[0]) is None:
        return None
    t0 = time.perf_counter()
    for a in anchors:
        chain_dp_native(MAX_DIST, MAX_DIST, BW, MAX_SKIP, 3, MIN_SC,
                        False, 1, a)
    dt = time.perf_counter() - t0
    value = 64 * ANCHORS_PER_READ / dt
    bl = baseline_anchors_per_s(anchors)
    base, spread = bl if bl else (None, None)
    return {
        "metric": "chaindp_anchors_per_s",
        "value": round(value, 1),
        "unit": "anchors/s",
        "vs_baseline": round(value / base, 3) if base else None,
        "baseline_single_core_c": round(base, 1) if base else None,
        "baseline_spread": spread,
        "device": "unreachable (tunnel stall) - native host path",
        "reads": 64,
        "anchors_per_read": ANCHORS_PER_READ,
    }


def _e2e_fields():
    """BASELINE.md scaling row: same-session end-to-end reads/s at 1 chip /
    1 host (400 x 10 kb map-ont SAM) for the host fast path, the calibrated
    --device tpu route, and the reference binary — each bounded so a hang
    can never block the JSON line. In-process steady-state timing (one
    warmup run paying index build / XLA compiles / link calibration, then
    three timed repeats, best taken) like the PERF.md tables — symmetric
    across devices, run as TWO alternating sessions per lane with pooled
    distributions so machine drift cannot favor whichever lane runs
    later. Each route also records its per-repeat distribution
    (min/median/max) and the tpu route records the link probe's own
    bandwidth + chosen routing, so the JSON self-describes the regime the
    numbers were captured in (VERDICT r2: best-case reporting)."""
    root = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(root, "tools", "e2e_bench.py")
    fields = {}

    TAG = {"host": "e2e_reads_per_s_host",
           "tpu": "e2e_reads_per_s_tpu_calibrated"}

    def pair_session():
        """ONE e2e_bench process interleaving host/tpu runs run-by-run
        (alternating pair order): the 1-core host's bursty scheduler was
        measured swinging SAME-MODE sessions 526-690 reads/s, so separate
        per-lane sessions compare lottery tickets, not lanes. Pairing puts
        both lanes under near-identical machine state seconds apart.
        400 reads => ~0.8 s/repeat so scheduler noise does not dominate."""
        try:
            out = subprocess.run(
                [sys.executable, bench, "--reads", "400", "--len", "10000",
                 "--device", "pair", "--steady", "6"],
                capture_output=True, text=True, timeout=720, cwd=root)
            for line in out.stdout.splitlines():
                for dev, tag in TAG.items():
                    pat = f"steady[{dev}]:"
                    if pat in line:
                        fields[tag] = float(line.split(pat)[1].split()[0])
                if "paired_ratio_median:" in line:
                    # median of adjacent host/tpu run-time ratios (>= 1.0
                    # means the tpu route is at least as fast under the
                    # same machine state) — the contract statistic; the
                    # per-lane bests above still carry burst luck
                    fields["e2e_tpu_vs_host_paired_ratio"] = float(
                        line.split(":")[1])
            rates = {dev: [] for dev in TAG}
            for line in out.stderr.splitlines():
                if line.startswith("run") and "reads/s" in line:
                    if line.startswith("run0"):
                        continue   # both lanes' warmup iteration
                    for dev in TAG:
                        if f"[{dev}]" in line:
                            rates[dev].append(
                                float(line.split(":")[1].split()[0]))
                if line.startswith("[calibrate]"):
                    # "[calibrate] d2h=XMB/s device_flow=on flow_share=Y"
                    for tok in line.split():
                        if tok.startswith("d2h="):
                            fields["link_mbps"] = float(
                                tok[4:].replace("MB/s", ""))
                        elif tok.startswith("device_flow="):
                            fields["link_flow"] = tok.split("=")[1]
                        elif tok.startswith("flow_share="):
                            fields["link_flow_share"] = float(
                                tok.split("=")[1])
            for dev, tag in TAG.items():
                srt = sorted(rates[dev])
                if srt:
                    fields[tag + "_runs"] = {
                        "min": srt[0], "median": srt[len(srt) // 2],
                        "max": srt[-1], "n": len(srt)}
        except Exception:
            pass
        for tag in TAG.values():
            fields.setdefault(tag, None)

    def one(tag, args, pat, tmo):
        try:
            out = subprocess.run(
                [sys.executable, bench, "--reads", "400", "--len", "10000",
                 *args], capture_output=True, text=True, timeout=tmo,
                cwd=root)
            for line in out.stdout.splitlines():
                if pat in line:
                    fields[tag] = float(line.split(pat)[1].split()[0])
        except Exception:
            pass
        fields.setdefault(tag, None)

    pair_session()
    one("e2e_reads_per_s_reference_binary", ["--ref"], "reference:", 300)
    return fields


def _refpair_fields(tag, extra_args, timeout):
    """One paired framework-vs-reference-binary capture (e2e_bench
    --device refpair: lanes interleaved run-by-run so the 1-core host's
    scheduler bursts hit both alike; the binary runs under the hang
    watchdog). Fields are prefixed with `tag`; ratio > 1 means the
    framework is faster."""
    root = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(root, "tools", "e2e_bench.py")
    fields = {}
    try:
        out = subprocess.run(
            [sys.executable, bench, *extra_args,
             "--device", "refpair", "--steady", "4"],
            capture_output=True, text=True, timeout=timeout, cwd=root)
        for line in out.stdout.splitlines():
            if "steady[host]:" in line:
                fields[f"{tag}_reads_per_s_host"] = float(
                    line.split("steady[host]:")[1].split()[0])
            elif "steady[ref]:" in line:
                fields[f"{tag}_reads_per_s_reference_binary"] = float(
                    line.split("steady[ref]:")[1].split()[0])
            elif "refpair_ratio_median:" in line:
                fields[f"{tag}_host_vs_ref_paired_ratio"] = float(
                    line.split(":")[1])
            elif "ref_hangs:" in line:
                fields[f"{tag}_ref_hangs"] = int(line.split(":")[1])
    except Exception:
        pass
    for suffix in ("reads_per_s_host", "reads_per_s_reference_binary",
                   "host_vs_ref_paired_ratio"):
        fields.setdefault(f"{tag}_{suffix}", None)
    return fields


def _e2e_sr150_fields():
    """Illumina-regime row: the reference's own headline is short reads
    ("three times as fast" than BWA-MEM, README.md:67-68; sr preset
    options.c:124) — 150 bp / 0.5% error under -ax sr."""
    return _refpair_fields("e2e_sr150",
                           ["--reads", "8000", "--len", "150",
                            "--err", "0.005", "--preset", "sr"], 600)


def _e2e_1kb_fields():
    """Short-read regime row (VERDICT r3 #2): 1 kb ONT-like reads."""
    return _refpair_fields("e2e_1kb",
                           ["--reads", "2000", "--len", "1000"], 900)


def _e2e_engaged_fields():
    """Engaged-regime capture (VERDICT r3 #1): a paired host/tpu session
    LONG enough per run to clear the flow's 15 s min-run ripeness gate
    (models/runtime.py), so the device lane can actually engage, with the
    run's flow telemetry recorded. Self-describing either way: in a
    healthy-link hour the JSON shows device_reads > 0 and the paired
    ratio; in a dead-link hour it shows the lane off/retired plus the
    probed link_mbps — below the documented ~25-35 MB/s break-even
    (PERF.md link-physics section) the controller's contract is to not
    lose, not to win. The pair warmup pre-pays the backend init +
    first-touch stall when the verdict engages the flow (e2e_bench), so
    timed runs measure the settled regime; the host lane's runs then
    carry the live client's ~6% idle tax — that is the engaged regime's
    real cost structure, unlike the short-run capture where deferral
    keeps the host lane clean."""
    root = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(root, "tools", "e2e_bench.py")
    n_reads = int(os.environ.get("MM2TPU_BENCH_ENGAGED_READS", "12000"))
    fields = {"e2e_engaged_reads": n_reads}
    try:
        # a ~25-min capture may trust a same-hour link verdict: the
        # default 300 s probe TTL is tuned for short mapping runs, and
        # re-probing mid-capture costs a 1-4 min first-touch stall per
        # expiry; 900 s keeps the calibrate/adopt path inside one capture
        env = {**os.environ}
        env.setdefault("MM2TPU_PROBE_TTL_S", "900")
        out = subprocess.run(
            [sys.executable, bench, "--reads", str(n_reads),
             "--len", "10000", "--device", "pair", "--steady", "3"],
            capture_output=True, text=True, timeout=1800, cwd=root,
            env=env)
        for line in out.stdout.splitlines():
            if "steady[host]:" in line:
                fields["e2e_engaged_reads_per_s_host"] = float(
                    line.split("steady[host]:")[1].split()[0])
            elif "steady[tpu]:" in line:
                fields["e2e_engaged_reads_per_s_tpu"] = float(
                    line.split("steady[tpu]:")[1].split()[0])
            elif "paired_ratio_median:" in line:
                fields["e2e_engaged_paired_ratio"] = float(
                    line.split(":")[1])
        flow = {"device_reads": 0, "ext_lane_reads": 0, "retired": 0,
                "retired_persisted": 0, "stall_fallback": 0}
        steal = {}
        for line in out.stderr.splitlines():
            if line.startswith("flow") and "[tpu]:" in line:
                for tok in line.split()[1:]:
                    k, v = tok.split("=")
                    if k in ("retired", "retired_persisted",
                             "stall_fallback"):
                        flow[k] += int(v)
                    elif k in flow:
                        flow[k] = max(flow[k], int(v))
            elif line.startswith("steal") and "[tpu]:" in line:
                # keep the run with the most stolen reads (counters are
                # per-run; the best-engaged run describes the lane)
                toks = dict(t.split("=") for t in line.split()[1:])
                if int(toks.get("steal_reads", 0)) >= steal.get(
                        "steal_reads", -1):
                    steal = {k: int(v) for k, v in toks.items()}
            elif line.startswith("[calibrate]"):
                for tok in line.split():
                    if tok.startswith("d2h="):
                        fields["e2e_engaged_link_mbps"] = float(
                            tok[4:].replace("MB/s", ""))
                    elif tok.startswith("device_flow="):
                        fields["e2e_engaged_link_flow"] = tok.split("=")[1]
                    elif tok.startswith("flow_share="):
                        fields["e2e_engaged_flow_share"] = float(
                            tok.split("=")[1])
        fields["e2e_engaged_device_reads_best_run"] = flow["device_reads"]
        fields["e2e_engaged_ext_lane_reads_best_run"] = flow["ext_lane_reads"]
        fields["e2e_engaged_retirements"] = (flow["retired"]
                                             + flow["retired_persisted"])
        fields["e2e_engaged_stall_fallbacks"] = flow["stall_fallback"]
        # steal-lane journey (r5): reads the work-stealing device lane
        # completed in its best run, its measured host-CPU cost per read
        # (the r4 "dispatch prep is asserted, never measured" gap), and
        # the economics guard's activity
        if steal:
            n = steal.get("steal_reads", 0)
            fields["e2e_engaged_steal_reads_best_run"] = n
            fields["e2e_engaged_steal_cpu_ms_per_read"] = (
                round(steal.get("steal_cpu_ms", 0) / n, 2) if n else None)
            fields["e2e_engaged_steal_cpu_split_ms"] = {
                k.replace("steal_", "").replace("_ms", ""):
                    steal.get(k, 0)
                for k in ("steal_prep_ms", "steal_flowhost_ms",
                          "steal_dispatch_ms", "steal_finish_ms")}
            fields["e2e_engaged_steal_paused"] = steal.get(
                "steal_paused", 0)
            fields["e2e_engaged_steal_probes"] = steal.get(
                "steal_probe", 0)
    except Exception:
        pass
    for tag in ("e2e_engaged_reads_per_s_host", "e2e_engaged_reads_per_s_tpu",
                "e2e_engaged_paired_ratio"):
        fields.setdefault(tag, None)
    return fields


def _e2e_genome_engaged_fields():
    """Genome-scale engaged capture (r5): the steal lane's economics are
    index-scale-dependent — at 3 Gbp map-pb (the fork's own flagship
    regime, run.sh:3) a stolen read saves 3.2 ms of host collect+chain
    CPU and costs ~3.2 ms total, so the lane PAYS where the MT capture's
    correctly pauses. Runs only when the 3 Gbp assets from the r5 session
    exist on this machine (tools/hpc_study.py + an .mm2i dump rebuild
    them); skips cleanly otherwise. Protocol identical to the MT engaged
    pair (steal telemetry per run, paired ratio as the contract stat)."""
    root = os.path.dirname(os.path.abspath(__file__))
    ref = "/tmp/genome_scale/genome3000.fa"
    idx = "/tmp/genome_scale/pb3000.mm2i"
    fields = {}
    if not (os.path.exists(ref) and os.path.exists(idx)):
        return {"e2e_genome_engaged": "skipped (no 3 Gbp assets on host)"}
    bench = os.path.join(root, "tools", "e2e_bench.py")
    try:
        env = {**os.environ}
        env.setdefault("MM2TPU_PROBE_TTL_S", "1800")
        out = subprocess.run(
            [sys.executable, bench, "--ref-fa", ref, "--index", idx,
             "--preset", "map-pb", "--reads", "4000", "--len", "10000",
             "--device", "pair", "--steady", "3"],
            capture_output=True, text=True, timeout=2400, cwd=root,
            env=env)
        for line in out.stdout.splitlines():
            if "steady[host]:" in line:
                fields["e2e_genome_engaged_reads_per_s_host"] = float(
                    line.split("steady[host]:")[1].split()[0])
            elif "steady[tpu]:" in line:
                fields["e2e_genome_engaged_reads_per_s_tpu"] = float(
                    line.split("steady[tpu]:")[1].split()[0])
            elif "paired_ratio_median:" in line:
                fields["e2e_genome_engaged_paired_ratio"] = float(
                    line.split(":")[1])
        best = {}
        for line in out.stderr.splitlines():
            if line.startswith("steal") and "[tpu]:" in line:
                toks = dict(t.split("=") for t in line.split()[1:])
                if int(toks.get("steal_reads", 0)) >= int(
                        best.get("steal_reads", -1)):
                    best = toks
        if best:
            n = int(best.get("steal_reads", 0))
            fields["e2e_genome_engaged_steal_reads_best_run"] = n
            fields["e2e_genome_engaged_steal_frac"] = round(n / 4000.0, 3)
            fields["e2e_genome_engaged_steal_cpu_ms_per_read"] = (
                round(int(best.get("steal_cpu_ms", 0)) / n, 2) if n
                else None)
    except Exception:
        pass
    for tag in ("e2e_genome_engaged_reads_per_s_host",
                "e2e_genome_engaged_reads_per_s_tpu",
                "e2e_genome_engaged_paired_ratio"):
        fields.setdefault(tag, None)
    return fields


def main():
    """Driver entry: run the device measurement in a child process with a
    timeout (the tunnel-attached TPU can stall indefinitely), retry, and
    fall back to the native host path so ONE JSON line always prints."""
    attempts = int(os.environ.get("MM2TPU_BENCH_ATTEMPTS", "3"))
    per_try_s = float(os.environ.get("MM2TPU_BENCH_TIMEOUT_S", "600"))
    try:
        # a FRESH failed link verdict means the tunnel is hard-dead right
        # now: one attempt still runs (the verdict could be a transient),
        # but burning 3 x 10 min of retries before the labeled fallback
        # helps nobody
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from minimap2_chaindp_tpu.utils import link_state
        ent = link_state.load().get("probe")
        if (isinstance(ent, dict) and ent.get("fail")
                and link_state.fresh(ent, 600.0)):
            attempts = 1
    except Exception:
        pass
    rec = None
    for k in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=per_try_s)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    break
        except subprocess.TimeoutExpired:
            pass
        if rec is not None:
            break
        if k + 1 < attempts:
            time.sleep(60)
    if rec is None:
        rec = host_native_fallback()
    if rec is None:
        rec = {"metric": "chaindp_anchors_per_s", "value": 0,
               "unit": "anchors/s", "vs_baseline": None,
               "device": "unreachable"}
    if os.environ.get("MM2TPU_BENCH_E2E", "1") == "1":
        rec.update(_e2e_fields())
        rec.update(_e2e_1kb_fields())
        rec.update(_e2e_sr150_fields())
    if os.environ.get("MM2TPU_BENCH_ENGAGED", "1") == "1":
        rec.update(_e2e_engaged_fields())
        rec.update(_e2e_genome_engaged_fields())
    if os.environ.get("MM2TPU_BENCH_PROJECTION", "1") == "1":
        rec.update(_flow_projection_fields())
    rec.update(_drift_fields(rec))
    print(json.dumps(rec))


def _flow_projection_fields():
    """Co-located projection (VERDICT r4 #2): on-chip fused-flow ms/read
    (pipelined, link-excluded — tools/flow_projection.py) at the 10 kb
    workload, with the measured host path and the derived co-located
    reads/s beside it. None-filled when the device is unreachable."""
    root = os.path.dirname(os.path.abspath(__file__))
    fields = {"flow_device_ms_per_read": None,
              "flow_projected_colocated_reads_per_s": None,
              "flow_projection_host_ms_per_read": None}
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(root, "tools",
                                          "flow_projection.py"),
             "--lengths", "10000", "--reads", "48", "--iters", "3",
             "--json"],
            capture_output=True, text=True, timeout=900, cwd=root,
            env={**os.environ, "MM2TPU_PROF": "1"})
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                r = rec.get("per_length", {}).get("10000", {})
                if "flow_device_ms_per_read" in r:
                    fields["flow_device_ms_per_read"] = \
                        r["flow_device_ms_per_read"]
                    fields["flow_projected_colocated_reads_per_s"] = \
                        r["projected_colocated_reads_per_s_1core"]
                    fields["flow_projection_host_ms_per_read"] = \
                        r["host_ms_per_read"]
                    if "cpu" in str(rec.get("device", "")).lower():
                        fields["flow_projection_note"] = \
                            "interpret-mode (no TPU): not on-chip time"
                break
    except Exception:
        pass
    return fields


def _drift_fields(rec):
    """Self-describing drift posture (VERDICT r4 #8): absolute reads/s
    fields on this shared 1-core host swing 2-3x round-to-round with
    machine load (host 688->559, reference 361->193 across r3->r4 with no
    code change) — only the *_paired_ratio fields and the on-chip kernel
    anchors/s carry cross-round signal. Also a warn-only tripwire: compare
    this run's ratio/kernel fields against the newest BENCH_r*.json."""
    import glob
    import re
    fields = {"drift_note": (
        "absolute *_reads_per_s_* fields are machine-drifting on this "
        "shared 1-core host (2-3x swings round-to-round); compare rounds "
        "via *_paired_ratio fields and the kernel anchors/s only")}
    warns = []
    try:
        root = os.path.dirname(os.path.abspath(__file__))
        benches = sorted(
            glob.glob(os.path.join(root, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
        if benches:
            prev_path = benches[-1]
            with open(prev_path) as f:
                prev = json.load(f)
            fields["drift_baseline_round"] = os.path.basename(prev_path)
            v0, v1 = prev.get("value"), rec.get("value")
            # only compare like with like: both on-device kernel numbers
            both_dev = all("native host path" not in str(
                r.get("device", "")) and "unreachable" not in str(
                r.get("device", "")) for r in (prev, rec))
            if both_dev and v0 and v1 and v1 < 0.8 * v0:
                warns.append(f"kernel anchors/s {v1:.3g} < 80% of "
                             f"{os.path.basename(prev_path)}'s {v0:.3g}")
            for k in sorted(set(prev) & set(rec)):
                if not k.endswith("paired_ratio"):
                    continue
                r0, r1 = prev.get(k), rec.get(k)
                if (isinstance(r0, (int, float))
                        and isinstance(r1, (int, float))
                        and r1 < r0 - 0.05):
                    warns.append(f"{k} {r1:.3f} < {r0:.3f} - 0.05")
    except Exception:
        pass
    fields["regression_warnings"] = warns
    return fields


def main_device():
    from minimap2_chaindp_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax
    from minimap2_chaindp_tpu.utils.synth import synth_batch
    from minimap2_chaindp_tpu.ops.chain_jax import split_anchors
    from minimap2_chaindp_tpu.ops import chain_pallas as CP

    dev = jax.devices()[0]
    interpret = dev.platform not in ("tpu", "axon") and "TPU" not in str(dev)

    max_n = (ANCHORS_PER_READ + 127) // 128 * 128

    def pack(seed):
        anchors = synth_batch(N_READS, ANCHORS_PER_READ, seed=seed)
        reads = []
        for a in anchors:
            xhi, rpos, qpos, span, sid = split_anchors(a)
            reads.append(dict(xhi=xhi, rpos=rpos, qpos=qpos, span=span, sid=sid,
                              avg_qspan=np.float32(span.sum()) / np.float32(len(a))))
        packed, nn, w1, exc, host_flag = CP.pack_reads(reads, max_n, MAX_DIST)
        args = [jax.device_put(packed[k])
                for k in ("xhi", "rpos", "qpos", "span", "sid", "stw")]
        args += [jax.device_put(nn), jax.device_put(w1), jax.device_put(exc)]
        jax.block_until_ready(args)  # materialize host->HBM before timing
        return anchors, args, CP.infer_use_exc(exc)

    def dispatch(args, use_exc):
        return CP.chain_scores_batch(
            *args, max_n=max_n, max_dist_x=MAX_DIST, max_dist_y=MAX_DIST,
            bw=BW, max_skip=MAX_SKIP, is_cdna=False, many_segs=False,
            interpret=interpret, use_exc=use_exc,
            # synth reads model 10 kb queries (qpos < 10000, span 15), so
            # chain scores fit 15 bits -> packed single-reduction epilogue
            score_bound=10300)

    def run(args, use_exc):
        f, p, flag = dispatch(args, use_exc)
        # fetch a tiny slice: defeats async dispatch illusions on tunneled
        # backends where block_until_ready returns before execution finishes
        return f, int(np.asarray(flag[:, 0]).sum())

    n_iter = 1 if interpret else 3
    batches = [pack(s) for s in range(n_iter + 1)]
    # ONE kernel variant across warmup and all timed batches — a per-batch
    # use_exc would let a timed call recompile mid-measurement
    use_exc = any(b[2] for b in batches)
    f, flagged = run(batches[0][1], use_exc)  # warmup/compile
    f, flagged = run(batches[0][1], use_exc)  # steady-state warmup
    # pipelined dispatch — the runtime's production shape (DeviceFlow and
    # _chain_batch stage every bucket's dispatch before blocking on any
    # result), so dispatch k+1 queues while k executes and the fixed
    # host<->device round trip is paid once per PIPELINE, not once per
    # call. Rep 1 sees never-executed batches; rep 2 re-dispatches the
    # same device buffers, which PJRT re-EXECUTES in full (there is no
    # result cache keyed on input buffers) — only compilation is reused,
    # exactly as in rep 1 after the warmup.
    # best-of-2 timed pipelines (same steady-state best-of methodology as
    # the e2e fields): the tunnel's per-exec round trip drifts ~5% between
    # captures, which is link noise, not kernel throughput
    total_anchors = N_READS * ANCHORS_PER_READ * n_iter
    value, flagged = 0.0, 0
    for _rep in range(1 if interpret else 2):
        t0 = time.perf_counter()
        outs = [dispatch(batches[it + 1][1], use_exc) for it in range(n_iter)]
        flagged = sum(int(np.asarray(flag[:, 0]).sum())
                      for _f, _p, flag in outs)
        t1 = time.perf_counter()
        value = max(value, total_anchors / (t1 - t0))

    bl = baseline_anchors_per_s(batches[0][0])
    base, spread = bl if bl else (None, None)
    rec = {
        "metric": "chaindp_anchors_per_s",
        "value": round(value, 1),
        "unit": "anchors/s",
        "vs_baseline": round(value / base, 3) if base else None,
        "baseline_single_core_c": round(base, 1) if base else None,
        "baseline_spread": spread,
        "device": str(dev),
        "reads": N_READS,
        "anchors_per_read": ANCHORS_PER_READ,
        "fallback_flagged_reads": flagged,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--child" in sys.argv:
        main_device()
    else:
        main()
