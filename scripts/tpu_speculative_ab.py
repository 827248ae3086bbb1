#!/usr/bin/env python3
"""A/B: speculative background compile of growth shapes vs cold growth.

Each arm runs in a subprocess with a FRESH persistent-cache dir, trains a
few steps at capacity C (giving the background compiler time to finish in
the ON arm), then forces a capacity growth and times the first post-growth
step — the foreground re-jit either deserializes the speculatively-compiled
executable from the cache (ON) or pays the full TPU compile (OFF)."""
import os
import subprocess
import sys
import tempfile
import time

CHILD = "--child" in sys.argv

if not CHILD:
    for arm in ("1", "0"):
        cache = tempfile.mkdtemp(prefix=f"specab_{arm}_")
        env = dict(os.environ, GS_SPECULATIVE_COMPILE=arm,
                   GS_COMPILE_CACHE=cache)
        print(f"=== arm GS_SPECULATIVE_COMPILE={arm} (cache {cache}) ===",
              flush=True)
        subprocess.run([sys.executable, __file__, "--child"], env=env,
                       timeout=1800)
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


from sparse_view_3dgs_pack_tpu.utils.compile_cache import enable_compile_cache
log("cache:", enable_compile_cache())

import numpy as np
import jax

from sparse_view_3dgs_pack_tpu.testing import (make_dryrun_opt,
                                               make_dryrun_pipe,
                                               make_fake_scene)
from sparse_view_3dgs_pack_tpu.train import capacity
from sparse_view_3dgs_pack_tpu.train.loop import Trainer

scene = make_fake_scene(n_points=180_000, n_views=4, width=800,
                        height_px=800, capacity=1 << 18, sh_degree=3, seed=3)
opt = make_dryrun_opt(iterations=100, densify_from_iter=10**9)
pipe = make_dryrun_pipe(use_pallas=None, max_pairs=1 << 21,
                        max_per_tile=2048, tile_batch=128)
tr = Trainer(scene, opt, pipe, scene.args, method="lgdwt", quiet=True)
log("speculation enabled:", tr.precompiler.enabled)

t0 = time.perf_counter()
m = tr.step()
_ = np.asarray(m["loss"])
log(f"first step (cold compile): {time.perf_counter() - t0:.1f}s")

# give the ON arm's background thread time to finish its edges; the OFF
# arm waits the same wall time for fairness
deadline = time.time() + 240
while time.time() < deadline:
    m = tr.step()
    _ = np.asarray(m["loss"])
    if tr.precompiler.enabled and len(tr.precompiler.compiled) >= 1:
        got = {k[0] for k in tr.precompiler.compiled}
        if tr.state.capacity * 2 in got:
            break
    time.sleep(0.5)
log(f"steps before growth: {tr.iteration}, "
    f"speculatively compiled: {tr.precompiler.compiled or None}")

# force the growth the speculation predicted
tr.state, tr.adam = capacity.grow_state(tr.state, tr.adam, quiet=True)
tr._rebuild_config()
log(f"capacity grown to {tr.state.capacity}")

t0 = time.perf_counter()
m = tr.step()
_ = np.asarray(m["loss"])
log(f"FIRST POST-GROWTH STEP: {time.perf_counter() - t0:.1f}s")
