"""The device-guard stall detector (utils/device_guard.py): a section that
exceeds its timeout marks the device bad and raises DeviceStall; later
sections fail fast; timeout=None bypasses the worker thread entirely."""
import time

import pytest

from minimap2_chaindp_tpu.utils import device_guard as dg


def setup_function(_):
    dg._bad = False


def test_direct_mode_and_result():
    assert dg.device_call(lambda: 41 + 1, None) == 42
    assert dg.device_call(lambda: "ok", 5.0) == "ok"


def test_exception_relay():
    with pytest.raises(ValueError):
        dg.device_call(lambda: (_ for _ in ()).throw(ValueError("x")), 5.0)
    assert not dg.device_bad()


def test_slow_call_recovery_lifts_ban():
    """A timed-out call that eventually COMPLETES on the worker (a long
    first compile, not a wedge) lifts the ban so later batches route to
    the device again; an erroring abandoned call does not."""
    with pytest.raises(dg.DeviceStall):
        dg.device_call(lambda: time.sleep(1.0) or "late-ok", 0.2)
    assert dg.device_bad()
    time.sleep(1.3)  # let the abandoned call finish on the worker
    assert not dg.device_bad()
    assert dg.device_call(lambda: 5, 5.0) == 5


def test_stall_marks_bad_and_fails_fast():
    with pytest.raises(dg.DeviceStall):
        dg.device_call(lambda: time.sleep(3), 0.2)
    assert dg.device_bad()
    t0 = time.perf_counter()
    with pytest.raises(dg.DeviceStall):
        dg.device_call(lambda: 1, 5.0)
    assert time.perf_counter() - t0 < 0.5  # no wait once marked bad
    # direct mode ignores the bad flag (interpret path)
    assert dg.device_call(lambda: 7, None) == 7
    # allow the wedged worker to drain before other tests reuse the thread
    time.sleep(3)
    dg._bad = False


def test_queued_waiter_bails_on_ban():
    """A call queued behind a wedged one must bail as soon as the ban
    lands, not sleep its whole (possibly 600 s compile) budget."""
    import threading
    errs = {}

    def first():
        try:
            dg.device_call(lambda: time.sleep(4), 0.3)
        except dg.DeviceStall:
            errs["first"] = True

    t = threading.Thread(target=first)
    t.start()
    time.sleep(0.05)       # let the wedge call occupy the worker
    t0 = time.perf_counter()
    with pytest.raises(dg.DeviceStall):
        dg.device_call(lambda: 1, 30.0)   # queued; budget 30 s
    dt = time.perf_counter() - t0
    t.join()
    assert errs.get("first")
    assert dt < 5.0        # bailed on the ban, not the 30 s budget
    time.sleep(4)          # drain the wedge before other tests
    dg._bad = False
