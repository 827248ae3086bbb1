"""Opt-in persistent XLA compile cache (`utils/compile_cache.py`).

The CLIs (train/render/metrics, and every harness subprocess stage) call
`enable_compile_cache()` right after their platform decision so repeated
shapes skip the 30-300 s TPU compile. These tests pin the gating logic;
the cache-hit behaviour itself is exercised on the real TPU (PARITY.md) —
it MUST stay off on CPU (XLA:CPU AOT deserialization SIGABRTs in this
environment, see tests/conftest.py).
"""

import os

from sparse_view_3dgs_pack_tpu.utils.compile_cache import enable_compile_cache


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("GS_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None


def test_cpu_backend_never_enables(monkeypatch, tmp_path):
    # conftest forces the CPU backend for the whole suite, so even an
    # explicit directory request must refuse to enable the cache.
    monkeypatch.setenv("GS_COMPILE_CACHE", str(tmp_path / "jit"))
    assert enable_compile_cache() is None
    assert not (tmp_path / "jit").exists()


def test_cli_entrypoints_call_it():
    # Keep the wiring from regressing: every jax-using CLI enables the
    # cache after its GS_FORCE_CPU / platform decision.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cli in ("train.py", "render.py", "metrics.py", "metrics_dtu.py"):
        with open(os.path.join(repo, cli)) as f:
            assert "enable_compile_cache" in f.read(), cli
