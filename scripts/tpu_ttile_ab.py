#!/usr/bin/env python3
"""A/B the training-step tile shape on the real TPU: 16x16 vs 32x16.

Same harness as bench.py's train phase (800p, 100k gaussians, full LGDWT
objective); each arm runs in a fresh subprocess so compile caches and the
tunnel's request dedupe can't cross-contaminate.

    python scripts/tpu_ttile_ab.py
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM = r"""
import sys, time, json
sys.path.insert(0, %(root)r)
import numpy as np
import jax, jax.numpy as jnp
from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig
from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras
from sparse_view_3dgs_pack_tpu.train.optim import init_adam, init_exposure_adam
from sparse_view_3dgs_pack_tpu.train.step import (CameraBank, StepCarry,
                                                  StepConfig, train_step)

W = H = 800
N = 100_000
TTX = %(ttx)d
rng = np.random.default_rng(0)
pts = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
cols = rng.random((N, 3)).astype(np.float32)
state = gm.create_from_pcd(pts, cols, n_images=4, sh_degree=3)
cams = make_orbit_cameras(4, radius=6.0, width=W, height_px=H)
for c in cams:
    c.image = rng.random((H, W, 3)).astype(np.float32)
    c.alpha_mask = np.ones((H, W), np.float32)
bank = CameraBank.from_cameras(cams)
cfg = StepConfig(width=W, height=H, sh_degree=3,
                 raster=RasterConfig(max_pairs=1 << 19, max_per_tile=1024,
                                     tile_batch=128, train_tile_x=TTX),
                 use_pallas=True, dwt_enable=True, patch_dwt_enable=True,
                 patch_size=128)
adam = init_adam(state.params)
exp_adam = init_exposure_adam(state.exposure)
carry = StepCarry(dwt_running_mean=jnp.ones(()))
lrs = {k: jnp.asarray(1e-3) for k in state.params}

def one(i, state, adam, exp_adam, carry):
    return train_step(state, adam, exp_adam, carry, bank,
                      jnp.asarray(i %% 4, jnp.int32), lrs,
                      jnp.asarray(0.0), jnp.asarray(0.0),
                      jnp.asarray(3, jnp.int32), jnp.zeros(3), cfg)

out = one(0, state, adam, exp_adam, carry)
_ = np.asarray(out.state.params["xyz"][0, 0])
state, adam, exp_adam, carry = out.state, out.adam, out.exp_adam, out.carry
best = float("inf")
ITERS = 20
for trial in range(3):
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        out = one(i, state, adam, exp_adam, carry)
        state, adam, exp_adam, carry = (out.state, out.adam, out.exp_adam,
                                        out.carry)
    _ = np.asarray(state.params["xyz"][0, 0])
    best = min(best, (time.perf_counter() - t0) / ITERS)
print(json.dumps({"ttx": TTX, "ms": best * 1000, "its": 1.0 / best}))
"""


def run_arm(ttx):
    code = ARM % {"root": ROOT, "ttx": ttx}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f"arm ttx={ttx} failed rc={r.returncode}")
    return json.loads(line[-1])


if __name__ == "__main__":
    for ttx in (0, 32):
        res = run_arm(ttx)
        label = "16x16" if ttx == 0 else f"{ttx}x16"
        print(f"train tiles {label}: {res['ms']:.1f} ms/iter "
              f"= {res['its']:.2f} it/s", flush=True)
