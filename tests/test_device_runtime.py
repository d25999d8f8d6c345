"""Device runtime (Pallas interpret on CPU) must produce output bit-identical
to the host pipeline on the bundled test pairs."""
import os

import pytest

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu import constants as C
from minimap2_chaindp_tpu.options import set_opt
from minimap2_chaindp_tpu.io.fastx import read_fastx, Frag
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.models.pipeline import map_fragment_output
from minimap2_chaindp_tpu.models.runtime import DeviceRuntime


@pytest.mark.parametrize("ref_fa,q_fa,flags", [
    ("MT-human.fa", "MT-orang.fa", C.MM_F_OUT_SAM | C.MM_F_CIGAR),
    ("t-inv.fa", "q-inv.fa", C.MM_F_OUT_SAM | C.MM_F_CIGAR),
    ("MT-human.fa", "MT-orang.fa", C.MM_F_OUT_CG | C.MM_F_CIGAR),
])
def test_device_runtime_matches_host(ref_fa, q_fa, flags):
    io, mo = set_opt(None)
    mo.flag |= flags
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, ref_fa)))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    frags = [Frag([q]) for q in read_fastx(os.path.join(REF_TEST_DIR, q_fa))]
    rt = DeviceRuntime(mi, mo)
    dev_lines = [l for ls in rt.map_batch(frags) for l in ls]
    host_lines = []
    for f in frags:
        host_lines.extend(map_fragment_output(mi, mo, f.segs))
    assert dev_lines == host_lines


@pytest.mark.slow
def test_device_align_executor_used():
    """The batched alignment scheduler must actually route jobs through the
    device extd2 path (not silently fall back to host for everything)."""
    io, mo = set_opt(None)
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, "MT-human.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    frags = [Frag([q]) for q in read_fastx(os.path.join(REF_TEST_DIR, "MT-orang.fa"))]
    rt = DeviceRuntime(mi, mo, device_seeds=True)
    rt._align_exec.native_max = 0   # route everything to the device kernel
    rt.map_batch(frags)
    assert rt._align_exec.n_device > 0
    # seeds run on device either through the fused flow (the default:
    # device_reads counts reads whose collect+chain ran in the fused step)
    # or through the staged device collector (device_seed)
    c = rt.timers.counters
    assert c.get("device_seed", 0) + c.get("device_reads", 0) > 0


DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _run_device_vs_host(preset, ref_fa, query_fas, flags):
    io, mo = set_opt(preset)
    mo.flag |= flags
    refs = list(read_fastx(ref_fa))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    frag_mode = len(query_fas) > 1
    from minimap2_chaindp_tpu.io.fastx import read_frags
    frags = [f for b in read_frags(query_fas, mo.mini_batch_size, frag_mode)
             for f in b]
    rt = DeviceRuntime(mi, mo)
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    assert dev == host
    return rt


def test_device_runtime_splice():
    """Splice preset through the device runtime: is_cdna chaining on device,
    exts2 extension on host; identical to the host pipeline."""
    rt = _run_device_vs_host(
        "splice", os.path.join(DATA, "splice_genome.fa"),
        [os.path.join(DATA, "splice_cdna.fa")],
        C.MM_F_OUT_SAM | C.MM_F_CIGAR)
    assert rt.timers.counters.get("device_reads", 0) > 0


def test_device_runtime_paired_end():
    """sr paired-end (multi-seg units, many_segs chaining, PE pairing)."""
    rt = _run_device_vs_host(
        "sr", os.path.join(REF_TEST_DIR, "MT-human.fa"),
        [os.path.join(DATA, "pe_1.fq"), os.path.join(DATA, "pe_2.fq")],
        C.MM_F_OUT_SAM | C.MM_F_CIGAR)
    assert rt.timers.counters.get("device_reads", 0) > 0


@pytest.mark.slow
def test_device_align_executor_splice():
    """Splice extension (exts2) jobs run on the device kernel path too."""
    io, mo = set_opt("splice")
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    refs = list(read_fastx(os.path.join(DATA, "splice_genome.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    from minimap2_chaindp_tpu.io.fastx import read_frags
    frags = [f for b in read_frags([os.path.join(DATA, "splice_cdna.fa")],
                                   mo.mini_batch_size, False) for f in b]
    rt = DeviceRuntime(mi, mo)
    rt._align_exec.native_max = 0   # route splice jobs to the device kernel
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    assert dev == host
    assert rt._align_exec.n_device > 0


# ------------------------------------------------- deferred-client mode

def _mt_setup():
    # the runtime's in-process probe cache outlives a runtime; clear it so
    # each deferral test sees only its own state file
    from minimap2_chaindp_tpu.models import runtime as rt_mod
    rt_mod._PROBE_MEM.clear()
    io, mo = set_opt(None)
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, "MT-human.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    frags = [Frag([q])
             for q in read_fastx(os.path.join(REF_TEST_DIR, "MT-orang.fa"))]
    return mi, mo, frags


def test_deferred_client_never_touches_backend(monkeypatch):
    """defer_client=True with no link verdict: every batch maps on the
    host path, output identical, and the device backend is NEVER
    initialized (the live client's threads cost a 1-core host ~6% of
    throughput — the r2/r3 driver captures' tpu-vs-host gap)."""
    monkeypatch.delenv("MM2TPU_DEVICE_FLOW", raising=False)
    monkeypatch.setenv("MM2TPU_PROBE_DEFER_S", "9999")  # no child spawn
    mi, mo, frags = _mt_setup()
    rt = DeviceRuntime(mi, mo, defer_client=True)
    assert rt._jax is None and rt._align_exec is None
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    assert dev == host
    assert rt._jax is None           # still deferred after mapping
    assert rt.device_flow is False   # probe pending -> host-only


def test_deferred_client_engages_on_healthy_verdict(tmp_path, monkeypatch):
    """defer_client=True + a fresh healthy persisted verdict + a ripe run:
    map_batch kicks the async client init (_kick_client_init) and the
    fused flow engages once the side thread publishes the backend,
    output still identical to the host pipeline."""
    import json
    import time
    monkeypatch.delenv("MM2TPU_DEVICE_FLOW", raising=False)
    monkeypatch.setenv("MM2TPU_PROBE_DEFER_S", "9999")
    monkeypatch.setenv("MM2TPU_FLOW_MIN_RUN_S", "0")    # instantly ripe
    state = tmp_path / "link_state.json"
    state.write_text(json.dumps(
        {"probe": {"mbps": 100.0, "t": time.time()}}))
    monkeypatch.setenv("MM2TPU_STATE_FILE", str(state))
    mi, mo, frags = _mt_setup()
    rt = DeviceRuntime(mi, mo, defer_client=True)
    assert rt._jax is None and rt.device_flow is True   # verdict adopted
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    # first ripe batch KICKS the async init and maps host-only meanwhile
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    assert dev == host
    assert rt._client_thread is not None
    rt._client_thread.join(timeout=60)
    assert rt._jax is not None       # side thread brought the client up
    assert rt._interpret is True     # cpu test platform detected at init
    # with the client up, the next batch engages the device path
    dev2 = [l for ls in rt.map_batch(frags) for l in ls]
    assert dev2 == host


def test_deferred_client_ignores_cpu_platform_verdict(tmp_path, monkeypatch):
    """A probe verdict from a cpu backend (auto mode on a box with no
    accelerator) reports RAM-speed 'bandwidth'; the device lane must not
    engage on it — interpret-mode flow is orders slower than the host."""
    import json
    import time
    monkeypatch.delenv("MM2TPU_DEVICE_FLOW", raising=False)
    monkeypatch.setenv("MM2TPU_PROBE_DEFER_S", "9999")
    monkeypatch.setenv("MM2TPU_FLOW_MIN_RUN_S", "0")
    state = tmp_path / "link_state.json"
    state.write_text(json.dumps(
        {"probe": {"mbps": 4000.0, "t": time.time(), "plat": "cpu"}}))
    monkeypatch.setenv("MM2TPU_STATE_FILE", str(state))
    mi, mo, frags = _mt_setup()
    rt = DeviceRuntime(mi, mo, defer_client=True)
    assert rt.device_flow is False
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    assert dev == host
    assert rt._jax is None   # backend never initialized


def test_device_flow_hpc_spans_over_127():
    """HPC minimizer spans reach 255 (reference sketch.c:111 emits any
    kmer_span < 256); the flow ships spans as ONE byte, which must be
    unsigned — an int8 wrap at >=128 silently corrupted reverse-strand
    anchor coordinates while every count-based guard still passed."""
    import numpy as np
    rng = np.random.default_rng(5)
    # run lengths 2-9 make spans STRADDLE 128 (32 below / 60 above here):
    # a uniform wrap (every span >= 128) only shifts all reverse-strand
    # ylo by the same -256, which chaining is invariant to — the mix is
    # what makes the corruption *relative* and output-visible
    bases = rng.integers(0, 4, 600)
    ref_seq = "".join("ACGT"[b] * int(rng.integers(2, 10)) for b in bases)
    io, mo = set_opt("map-pb")      # HPC preset
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    from minimap2_chaindp_tpu.index.sketch import sketch
    mv = sketch(ref_seq, io.w, io.k, 0, bool(io.flag & 1))
    spans = (np.asarray([x for x, _ in mv], dtype=np.uint64)
             & np.uint64(0xFF)).astype(int)
    assert (spans >= 128).any()     # the construction really triggers it
    mi = build_index(["hpc_ref"], [ref_seq], io.w, io.k, io.flag,
                     io.bucket_bits)
    mo.update(mi)
    # forward + revcomp queries (the wrap corrupted ylo on reverse strand)
    q_fwd = ref_seq[500:3000]
    q_rev = q_fwd[::-1].translate(str.maketrans("ACGT", "TGCA"))
    from minimap2_chaindp_tpu.io.fastx import SeqRecord
    frags = [Frag([SeqRecord("qf", q_fwd)]), Frag([SeqRecord("qr", q_rev)])]
    rt = DeviceRuntime(mi, mo)
    dev = [l for ls in rt.map_batch(frags) for l in ls]
    host = []
    for f in frags:
        host.extend(map_fragment_output(mi, mo, f.segs))
    assert dev == host
    assert rt.timers.counters.get("device_reads", 0) > 0
