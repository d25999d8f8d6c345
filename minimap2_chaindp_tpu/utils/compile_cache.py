"""Persistent XLA compilation cache.

On the tunnel-attached TPU every kernel shape costs 20-40 s of remote
compilation per process; the reference pays nothing analogous (its SIMD
kernels are AOT-compiled). Enabling JAX's persistent cache makes every
process after the first start hot: measured 74 s -> 1.8 s for the chaining
kernel's first call. Opt out with MM2TPU_XLA_CACHE=0."""
from __future__ import annotations

import os

_done = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    path = path or os.environ.get(
        "MM2TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mm2tpu", "xla"))
    if not path or path == "0":
        return
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
