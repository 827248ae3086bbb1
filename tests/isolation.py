"""Run individual tests in fresh pytest subprocesses.

XLA:CPU's in-process JIT has segfaulted (SIGSEGV inside
`backend_compile_and_load`) three separate times at the e2e LGDWT
train-step compile — always late in a long-lived suite process, never
when the same test runs in a fresh interpreter, and never at a
reproducible predecessor (bisects of every suite prefix pass). The
containment is the same defence `bench.py` and
`__graft_entry__.dryrun_multichip` use against transient backend
failures: run the fragile big-compile tests in their own short-lived
process, with a bounded retry.

The child is a normal pytest invocation of the real test (named
``*_child`` and skipped unless the marker env var is set), so fixtures,
the conftest platform forcing, and the per-test watchdog all apply
inside the child; a wedged child is killed by the watchdog and counted
as a failed attempt here.
"""

import os
import subprocess
import sys

import pytest

CHILD_ENV = "SUITE_ISOLATED_CHILD"
IS_CHILD = os.environ.get(CHILD_ENV) == "1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mark the real test body: only collected inside an isolated child run
child_only = pytest.mark.skipif(
    not IS_CHILD, reason="body runs in an isolated child process")


def run_isolated(nodeid: str, attempts: int = 2, timeout: float = 1500):
    """Run one test node in a fresh pytest subprocess, retrying once.

    Fails the calling (parent) test with the child's output if every
    attempt fails, so the diagnosis is in the normal pytest report.
    """
    env = dict(os.environ)
    env[CHILD_ENV] = "1"
    last = None
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", nodeid, "-q", "-x",
                 "-p", "no:cacheprovider"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=timeout)
        except subprocess.TimeoutExpired as exc:
            last = exc
            continue
        if proc.returncode == 0:
            return
        sys.stderr.write(
            f"[isolation] {nodeid} attempt {attempt + 1}/{attempts} "
            f"failed (rc={proc.returncode})\n")
        last = proc
    if isinstance(last, subprocess.TimeoutExpired):
        pytest.fail(f"isolated test {nodeid} timed out after {timeout}s "
                    f"in all {attempts} attempts")
    pytest.fail(f"isolated test {nodeid} failed in all {attempts} attempts "
                f"(rc={last.returncode}):\n{last.stdout[-4000:]}\n"
                f"{last.stderr[-2000:]}")
