"""Opt-in persistent XLA compilation cache for the CLIs.

Every CLI invocation (train/render/metrics/harness stage) is a fresh
process that pays the full compile of its jitted programs — 30-300 s on
the remote TPU before the first step runs. JAX's persistent compilation
cache removes that for repeated shapes (the harness re-runs the same
configs constantly).

NOT enabled on CPU: XLA:CPU AOT deserialization SIGABRTs in this
environment on a host machine-feature mismatch ("+prefer-no-gather is
not supported on the host machine", cpu_aot_loader.cc) — see
tests/conftest.py. TPU executables don't go through that loader.

Set ``GS_COMPILE_CACHE=0`` to disable, or to a directory path to choose
the location (default ``~/.cache/sparse_view_3dgs_pack_tpu/jit``).
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Enable the persistent cache when the backend is not CPU.

    Call after any `jax.config.update("jax_platforms", ...)` decisions
    and before the first compilation. Returns the cache dir when
    enabled, else None.
    """
    setting = os.environ.get("GS_COMPILE_CACHE", "")
    if setting in ("0", "off", "no"):
        return None

    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        return None
    if backend == "cpu":
        return None

    cache_dir = setting if setting and setting not in ("1", "on") else (
        os.path.join(os.path.expanduser("~"), ".cache",
                     "sparse_view_3dgs_pack_tpu", "jit"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable time, not only >1s programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
