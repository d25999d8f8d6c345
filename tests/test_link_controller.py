"""Two-lane share controller + persisted link state (round-3 contract:
`--device tpu` never loses to host-only — the controller must converge from
measured rates, retire a losing lane, persist the verdict, and parole it
when the link recovers)."""
import importlib
import os
import time

import pytest

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu import constants as C
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.io.fastx import Frag, read_fastx
from minimap2_chaindp_tpu.models.runtime import DeviceRuntime
from minimap2_chaindp_tpu.options import set_opt
from minimap2_chaindp_tpu.utils import link_state


@pytest.fixture
def state_file(tmp_path, monkeypatch):
    p = tmp_path / "link_state.json"
    monkeypatch.setenv("MM2TPU_STATE_FILE", str(p))
    return p


def _runtime():
    io, mo = set_opt(None)
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, "MT-human.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    return mi, mo


def test_state_roundtrip_and_ttl(state_file):
    link_state.save({"probe": {"mbps": 12.5, "t": time.time()}})
    st = link_state.load()
    assert st["probe"]["mbps"] == 12.5
    assert link_state.fresh(st["probe"], 90)
    assert not link_state.fresh(st["probe"], -1)
    stale = {"mbps": 3.0, "t": time.time() - 1e6}
    assert not link_state.fresh(stale, 90)
    # corruption tolerated
    state_file.write_text("{torn")
    assert link_state.load() == {}


def test_state_disabled_by_empty_env(monkeypatch, tmp_path):
    monkeypatch.setenv("MM2TPU_STATE_FILE", "")
    link_state.save({"probe": {"mbps": 1.0, "t": time.time()}})
    assert link_state.load() == {}


def test_adopt_persisted_share_and_retirement(state_file):
    mi, mo = _runtime()
    frags = [Frag([q]) for q in
             read_fastx(os.path.join(REF_TEST_DIR, "MT-orang.fa"))]
    # persisted learned share for this workload's read-length bucket
    import numpy as np
    lens = [len(s.seq) for f in frags[:64] for s in f.segs]
    wkey = f"rl{int(np.log2(max(float(np.mean(lens)), 64.0)))}"
    link_state.save({f"share:{wkey}": {"share": 0.42, "mbps": 20.0,
                                       "t": time.time()}})
    rt = DeviceRuntime(mi, mo)
    rt._interpret = False    # exercise the real adoption path
    rt.link_mbps = 20.0
    rt._adopt_state(frags)
    assert rt._flow_share == pytest.approx(0.42)
    assert rt.device_flow

    # a fresh retirement verdict on a similar link turns the lane off
    link_state.save({f"retired:{wkey}": {"mbps": 20.0, "t": time.time()}})
    rt2 = DeviceRuntime(mi, mo)
    rt2._interpret = False
    rt2.link_mbps = 20.0
    rt2._adopt_state(frags)
    assert rt2._retired and not rt2.device_flow

    # parole: a 2x-better probed link ignores the stale verdict
    rt3 = DeviceRuntime(mi, mo)
    rt3._interpret = False
    rt3.link_mbps = 50.0
    rt3._adopt_state(frags)
    assert not rt3._retired and rt3.device_flow

    # an EXPIRED retirement is ignored even on the same link
    link_state.save({f"retired:{wkey}": {
        "mbps": 20.0, "t": time.time() - link_state.RETIRE_TTL_S - 1}})
    rt4 = DeviceRuntime(mi, mo)
    rt4._interpret = False
    rt4.link_mbps = 20.0
    rt4._adopt_state(frags)
    assert not rt4._retired and rt4.device_flow


def test_host_delegation_when_probe_rejects(state_file):
    """A runtime whose link probe said no must route batches through the
    HostRuntime path (structural parity with --device host) and still
    produce identical output."""
    from minimap2_chaindp_tpu.models.pipeline import map_fragment_output
    mi, mo = _runtime()
    frags = [Frag([q]) for q in
             read_fastx(os.path.join(REF_TEST_DIR, "MT-orang.fa"))]
    rt = DeviceRuntime(mi, mo)
    rt.device_flow = False
    rt._probe_chose_off = True
    assert rt._host_delegate_ok()
    lines = [l for ls in rt.map_batch(frags) for l in ls]
    assert rt._host is not None          # the delegate actually ran
    host_lines = []
    for f in frags:
        host_lines.extend(map_fragment_output(mi, mo, f.segs))
    assert lines == host_lines
    # env-forced flow-off keeps the staged device path (no delegation)
    rt2 = DeviceRuntime(mi, mo)
    rt2.device_flow = False              # as if MM2TPU_DEVICE_FLOW=0
    assert not rt2._host_delegate_ok()


def test_min_run_gate(state_file):
    """A run engages the device lane only after the min-run ripeness
    window (the process's first device round trip can stall for minutes,
    which a short run cannot amortize); interpret mode and an engaged
    controller are always ripe."""
    import time
    mi, mo = _runtime()
    rt = DeviceRuntime(mi, mo)
    assert rt._flow_ripe()          # interpret (CPU tests): always ripe
    rt._interpret = False
    rt._t_first_map = time.time()
    assert not rt._flow_ripe()      # fresh run: not ripe
    rt._t_first_map = time.time() - 1e4
    assert rt._flow_ripe()          # long-running: ripe
    rt._t_first_map = time.time()
    rt._ctrl_updates = 1
    assert rt._flow_ripe()          # already engaged: stays engaged


def test_oversized_reads_take_fast_path(state_file, monkeypatch):
    """Reads beyond the flow's buckets (~21 kb) must ride the native fast
    path in device mode, not strand on the staged Python align — and the
    adaptive device share must never claim them (they are not
    flow-absorbable)."""
    import numpy as np
    from minimap2_chaindp_tpu.native import map_unit_ok
    monkeypatch.setenv("MM2TPU_NATIVE_CHAIN_MAX", "2048")
    mi, mo = _runtime()
    if not map_unit_ok(mo, mi):
        pytest.skip("no native lib")
    rng = np.random.default_rng(8)
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, "MT-human.fa")))
    ref = refs[0].seq
    # a "50 kb" read made of tiled MT segments (MT is 16.5 kb)
    seq = (ref * 4)[:50000]
    frags = [Frag([type(refs[0])("big", seq)])]
    # plus normal fast-path reads
    for i in range(4):
        st = int(rng.integers(0, len(ref) - 1000))
        frags.append(Frag([type(refs[0])(f"s{i}", ref[st:st + 1000])]))
    rt = DeviceRuntime(mi, mo)
    rt._flow_share = 0.9          # aggressive device share
    out = rt.map_batch(frags)
    assert rt.timers.counters.get("fast_native", 0) >= 1
    # identity with the host pipeline
    from minimap2_chaindp_tpu.models.pipeline import map_fragment_output
    host = [map_fragment_output(mi, mo, f.segs) for f in frags]
    assert [l for ls in out for l in ls] == [l for ls in host for l in ls]


def test_controller_converges_and_retires(state_file):
    """Drive the real controller: (a) measured rates override the seed and
    converge toward dev_rate/(dev+host); (b) two consecutive ~zero-target
    sub-rounds retire the lane and persist the verdict for the workload
    key; (c) a winning lane is never retired."""
    mi, mo = _runtime()
    rt = DeviceRuntime(mi, mo)
    rt._interpret = False
    rt._wkey = "rl10"
    rt.link_mbps = 3.0
    rt._flow_share = 0.5  # badly mis-seeded

    # healthy lanes: dev maps 32 reads in 0.1 s, host 32 in 0.3 s ->
    # target 0.75; the share must move toward it and never strike
    for _ in range(4):
        rt._ctrl_update(32, 0.1, 32, 0.3)
    assert 0.6 < rt._flow_share <= 0.95
    assert rt._lowshare_strikes == 0 and rt.device_flow
    assert link_state.fresh(link_state.load().get("share:rl10"), 90)

    # losing lane: dev maps 2 reads in 4 s while host does 62 in 0.1 s
    rt._ctrl_update(2, 4.0, 62, 0.1)
    assert rt.device_flow and rt._lowshare_strikes == 1  # one strike only
    rt._ctrl_update(2, 4.0, 62, 0.1)
    assert rt._retired and not rt.device_flow
    assert link_state.fresh(link_state.load().get("retired:rl10"),
                            link_state.RETIRE_TTL_S)
    # the delegate path now takes over whole batches
    assert rt._host_delegate_ok()
