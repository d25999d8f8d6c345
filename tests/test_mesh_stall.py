"""Mesh fallback posture (VERDICT r3 #4): a stalled or banned device under
`--mesh` must degrade to the exact host path — byte-identical output, the
run completes, and the stall is observable in the counters.  The reference
analog is the per-read err_flag software redo (reference map.c:933-944);
here the whole sharded lane degrades.  Runs over the virtual 8-device CPU
mesh (conftest)."""
import os

import pytest

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu import constants as C
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.io.fastx import Frag, read_fastx
from minimap2_chaindp_tpu.models.pipeline import map_fragment_output
from minimap2_chaindp_tpu.models.runtime import DeviceRuntime
from minimap2_chaindp_tpu.options import set_opt
from minimap2_chaindp_tpu.utils import device_guard as dg


def _setup():
    io, mo = set_opt(None)
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, "MT-human.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    frags = [Frag([q]) for q in
             read_fastx(os.path.join(REF_TEST_DIR, "MT-orang.fa"))]
    host_lines = []
    for f in frags:
        host_lines.extend(map_fragment_output(mi, mo, f.segs))
    return mi, mo, frags, host_lines


def test_mesh_stall_falls_back_to_host(monkeypatch):
    """Every device dispatch of the sharded mesh flow stalls -> every
    bucket takes its host fallback; output stays byte-identical and
    stall_fallback counters record the event."""
    mi, mo, frags, host_lines = _setup()

    def _always_stall(fn, timeout_s):
        if timeout_s is None:
            # interpret-mode direct sections still stall in this scenario:
            # the mesh lane must not depend on a healthy device anywhere
            raise dg.DeviceStall("injected mesh stall")
        raise dg.DeviceStall("injected mesh stall")

    monkeypatch.setattr(dg, "device_call", _always_stall)
    rt = DeviceRuntime(mi, mo, mesh_shape=(4, 2))
    lines = [l for ls in rt.map_batch(frags) for l in ls]
    assert lines == host_lines
    c = rt.timers.counters
    assert c.get("stall_fallback", 0) > 0 or c.get("host_seed", 0) > 0
    assert c.get("device_reads", 0) == 0


def test_mesh_banned_device_fails_fast(monkeypatch):
    """With the device already marked bad (wedge detector) and the runtime
    on the GUARDED path (as on real hardware — interpret mode deliberately
    bypasses the guard), a mesh run's dispatches all fail fast and route
    to the host lane: identical output, zero device reads, and the whole
    run finishes without waiting out any timeout."""
    import time

    mi, mo, frags, host_lines = _setup()
    monkeypatch.setattr(dg, "_bad", True)
    rt = DeviceRuntime(mi, mo, mesh_shape=(4, 2))
    # force the guarded (timed) dispatch path the real-TPU mesh uses; the
    # banned guard raises before any traced code would compile, so the
    # CPU backend never sees a non-interpret Pallas kernel
    rt._interpret = False
    t0 = time.perf_counter()
    lines = [l for ls in rt.map_batch(frags) for l in ls]
    dt = time.perf_counter() - t0
    assert lines == host_lines
    c = rt.timers.counters
    assert c.get("device_reads", 0) == 0
    assert c.get("stall_fallback", 0) > 0 or c.get("host_seed", 0) > 0
    assert dt < rt._dev_timeout  # failed fast, no timeout waits
