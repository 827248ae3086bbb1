"""Speculative background compilation of grown-capacity train steps.

Under XLA every static shape is its own executable; a densify-phase run
walks through several parameter capacities and pair-bucket sizes, and each
growth re-jit stalls the loop for the full compile (30-70 s per shape on
the remote TPU — the round-3 30k-iteration run measured ~1.0 ks of such
stalls in its first 2.5k iterations). The reference never pays this: torch
reallocates tensors eagerly with no compilation step
(`LGDWT-GS/scene/gaussian_model.py:316-407`).

The TPU-native fix: the growth policy is deterministic (capacity doubles,
the pair bucket doubles), so the NEXT shapes are known long before they are
needed. A background thread AOT-lowers and compiles the train step for
those shapes while training continues at the current shape; the compiled
executable lands in the persistent XLA compilation cache
(`utils/compile_cache.py`), so the foreground re-jit at growth time
deserializes in ~1 s instead of recompiling.

Speculation is best-effort by construction: a failed or wasted background
compile costs idle server CPU only, never correctness — the foreground
path is byte-identical with or without it.
"""

from __future__ import annotations

import atexit
import os
import queue
import threading

import jax


def speculation_enabled() -> bool:
    """On by default wherever the persistent compile cache is active
    (non-CPU backends); ``GS_SPECULATIVE_COMPILE=0/1`` overrides both ways
    (tests use =1 to exercise the path on CPU, where AOT compilation is
    safe — only cache *deserialization* is broken, see compile_cache.py)."""
    setting = os.environ.get("GS_SPECULATIVE_COMPILE", "")
    if setting in ("0", "off", "no"):
        return False
    if setting in ("1", "on", "yes"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False


class SpeculativeCompiler:
    """Serial background compile queue, deduplicated by shape key.

    One worker thread (compiles are already internally parallel server-side;
    a storm of concurrent speculative compiles would contend with the
    foreground's own growth compile). JAX tracing is thread-safe; the
    thunks touch no trainer state.
    """

    def __init__(self, enabled: bool = True, quiet: bool = True):
        self.enabled = enabled
        self.quiet = quiet
        self._seen = set()
        self._q = queue.Queue()
        self._lock = threading.Lock()
        self._worker = None
        self._stopping = False
        self.compiled = []          # keys that finished (for tests/logs)
        self.failed = []
        if enabled:
            # a daemon thread killed INSIDE an XLA compile RPC aborts the
            # whole process at interpreter shutdown (C++ terminate); drain
            # the in-flight compile first, abandon the queued rest
            atexit.register(self._shutdown)

    def submit(self, key, thunk, label=None) -> bool:
        """Queue `thunk` (→ lower().compile()) unless `key` was already
        submitted. `label` is the compact log name (keys may embed whole
        configs for exact dedup). Returns True when queued."""
        if not self.enabled:
            return False
        with self._lock:
            if key in self._seen:
                return False
            self._seen.add(key)
            self._q.put((key, label if label is not None else key, thunk))
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(
                    target=self._drain, name="gs-speculative-compile",
                    daemon=True)
                self._worker.start()
        return True

    def mark_known(self, key):
        """Record a shape the foreground already compiled — speculating on
        it would be pure waste."""
        with self._lock:
            self._seen.add(key)

    def _shutdown(self):
        self._stopping = True
        worker = self._worker
        if worker is not None and worker.is_alive():
            worker.join(180.0)      # bounded: a wedged compile aborts anyway

    def _drain(self):
        while not self._stopping:
            try:
                key, label, thunk = self._q.get_nowait()
            except queue.Empty:
                return
            try:
                thunk()
                self.compiled.append(key)
                if not self.quiet:
                    print(f"[precompile] ready: {label}")
            except Exception as e:   # speculative: never fatal
                self.failed.append(key)
                if not self.quiet:
                    print(f"[precompile] {label}: {type(e).__name__}: {e}")

    def wait_idle(self, timeout: float = 120.0):
        """Block until the queue drains (tests only)."""
        if self._worker is not None:
            self._worker.join(timeout)


def grown_specs(state, adam, new_capacity: int):
    """Abstract (ShapeDtypeStruct) pytrees for `state`/`adam` after a
    capacity growth to `new_capacity`, derived by abstractly evaluating the
    REAL growth functions — so the speculative avals match the foreground's
    future arguments exactly (any drift would waste the compile)."""
    from ..models import gaussians as gm
    from . import capacity as cap_mod

    def grow(s, a):
        s2 = gm.grow_capacity(s, new_capacity)
        return s2, cap_mod.pad_adam(a, s2.params)

    return jax.eval_shape(grow, state, adam)


def specs_of(tree):
    """Exact avals (incl. weak types) of a concrete arg pytree."""
    return jax.eval_shape(lambda t: t, tree)


def speculate_growth_edges(compiler: SpeculativeCompiler, state, adam,
                           cur_max_pairs: int, pair_hard_cap: int,
                           cfg_for, lower_with, mark_current=None):
    """Submit a loop's deterministic growth edges to `compiler`.

    Shared by all four training loops (Trainer/fsgs/dng/nir — same contract
    as the shared capacity module): the edges are 2× parameter capacity
    (state/adam avals grown via the real growth functions) and 2×/½ pair
    bucket (same avals, different static raster config).

    - ``cfg_for(capacity, max_pairs_or_None)`` → the static step config the
      loop would rebuild at that shape.
    - ``lower_with(state_spec, adam_spec, cfg, capacity)`` → lowers and
      compiles the loop's jitted step(s); runs on the background thread.
    - ``mark_current`` — (capacity, cfg) the foreground just compiled, so
      it is never speculated.
    """
    if not compiler.enabled:
        return
    if mark_current is not None:
        compiler.mark_known(mark_current)
    cap = state.capacity
    cur_specs = specs_of((state, adam))
    edges = [(grown_specs(state, adam, cap * 2), cfg_for(cap * 2, None))]
    if cur_max_pairs * 2 <= pair_hard_cap:
        edges.append((cur_specs, cfg_for(cap, cur_max_pairs * 2)))
    if cur_max_pairs > (1 << 16):
        edges.append((cur_specs, cfg_for(cap, cur_max_pairs // 2)))

    for (s_spec, a_spec), cfg_ in edges:
        cap_ = int(jax.tree.leaves(s_spec)[0].shape[0])
        raster = getattr(cfg_, "raster", None) or getattr(
            getattr(cfg_, "base", None), "raster", None)

        def thunk(s=s_spec, a=a_spec, c=cfg_, n=cap_):
            lower_with(s, a, c, n)

        compiler.submit(
            (cap_, cfg_), thunk,
            label=f"capacity={cap_} max_pairs={raster.max_pairs}")
