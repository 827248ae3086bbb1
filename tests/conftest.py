"""Test harness config: force CPU backend with an 8-device virtual mesh
BEFORE jax initialises, so sharding tests run without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; the config
# update below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: no persistent compilation cache here, deliberately. XLA:CPU AOT
# deserialization in this environment hits a machine-feature mismatch
# ("+prefer-no-gather is not supported on the host machine",
# cpu_aot_loader.cc) and `backend.deserialize_executable` can abort the
# whole pytest process (observed SIGABRT from
# compilation_cache.get_executable_and_time). Slow cold compiles are the
# safe trade; the loop-integration tests are structured to compile each
# train step exactly once.

# ---------------------------------------------------------------------------
# Per-test timeout (pytest-timeout is not in the env). A watchdog dumps all
# thread tracebacks and hard-exits if a single test exceeds its budget —
# this interrupts even native/futex hangs that a SIGALRM Python handler
# cannot (one full-suite wedge was observed at an interpret-mode Pallas
# test, stuck in a futex wait with zero CPU).
# Budgets: default 600 s, @slow 1800 s, or @timeout(N) explicit.
# ---------------------------------------------------------------------------
import faulthandler  # noqa: E402
import sys  # noqa: E402

import pytest  # noqa: E402

_DEFAULT_TIMEOUT = 600.0
_SLOW_TIMEOUT = 1800.0

# pytest's fd-level capture replaces fd 2 before conftest import, so a dup
# of "stderr" here still lands in a discarded temp file. Dump to a sidecar
# file instead (observed otherwise: '..' then rc=1, no clue why) and name
# the victim test so the kill is diagnosable.
_WATCHDOG_LOG = os.environ.get("PYTEST_WATCHDOG_LOG",
                               "/tmp/pytest_watchdog_dump.log")
_watchdog_file = open(_WATCHDOG_LOG, "a")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    marker = item.get_closest_marker("timeout")
    if marker is not None and marker.args:
        budget = float(marker.args[0])
    elif item.get_closest_marker("slow") is not None:
        budget = _SLOW_TIMEOUT
    else:
        budget = _DEFAULT_TIMEOUT
    _watchdog_file.write(f"=== {item.nodeid} (budget {budget:.0f}s)\n")
    _watchdog_file.flush()
    faulthandler.dump_traceback_later(budget, exit=True,
                                      file=_watchdog_file)
    try:
        yield
    finally:
        faulthandler.cancel_dump_traceback_later()
        _watchdog_file.write(f"=== done {item.nodeid}\n")
        _watchdog_file.flush()
