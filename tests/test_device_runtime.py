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
