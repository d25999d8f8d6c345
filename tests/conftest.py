import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (driver validates the real-TPU path separately).
os.environ["JAX_PLATFORMS"] = "cpu"
# NB: the environment pre-imports jax (axon sitecustomize), so the env var is
# already latched — override through jax.config before first backend use.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Device-runtime tests validate the DEVICE chaining path; disable the
# native-chain crossover routing so small test reads still exercise it
# (the native paths are covered by the host-pipeline golden tests and the
# dedicated native parity tests).
os.environ.setdefault("MM2TPU_NATIVE_CHAIN_MAX", "0")

# Hermetic tests: never read/write the persisted link/controller state a
# real-TPU run may have left (utils/link_state) — a stale retirement
# verdict must not steer interpret-mode routing.
os.environ["MM2TPU_STATE_FILE"] = ""

REF_TEST_DIR = "/root/reference/test"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# Build the compiled-reference oracles on demand so a fresh checkout runs the
# full oracle-backed suites instead of skipping them (each oracle module's
# skipif evaluates at import time, after this). A failed build (no reference
# tree / toolchain) leaves the artifacts absent and those suites skip; the
# failure is cached in a marker file so later sessions do not silently
# re-pay the build timeout (ADVICE r4) — delete .golden/.build_failed to
# retry after fixing the toolchain.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FAIL_MARK = os.path.join(_ROOT, ".golden", ".build_failed")
if (not os.path.exists(os.path.join(_ROOT, ".golden", "minimap2_ref"))
        and not os.path.exists(_FAIL_MARK)
        and os.path.isdir("/root/reference")):
    import subprocess
    print("[conftest] building compiled-reference oracles (one-off)...",
          file=sys.stderr)
    try:
        subprocess.run(
            ["bash", os.path.join(_ROOT, "golden", "build_reference.sh")],
            capture_output=True, timeout=600)
    except Exception:
        pass
    if not os.path.exists(os.path.join(_ROOT, ".golden", "minimap2_ref")):
        print("[conftest] oracle build FAILED; oracle-backed suites will "
              f"skip (rm {_FAIL_MARK} to retry)", file=sys.stderr)
        os.makedirs(os.path.dirname(_FAIL_MARK), exist_ok=True)
        open(_FAIL_MARK, "w").close()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode device kernel suites (~15 min total); the "
        "default smoke tier skips them — run with MM2TPU_FULL=1 or -m slow")


def pytest_collection_modifyitems(config, items):
    """Two test tiers (SURVEY §4 test strategy): the default smoke tier
    (<2 min) runs every byte-identity-critical suite; the slow tier adds
    the interpret-mode Pallas extension/backtrack suites. Select the full
    run with MM2TPU_FULL=1 or an explicit -m expression."""
    if os.environ.get("MM2TPU_FULL") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (MM2TPU_FULL=1 or -m slow to run)")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
