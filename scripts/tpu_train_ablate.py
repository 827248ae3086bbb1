#!/usr/bin/env python3
"""Train-step ablation with honest (materialized) timing: find where the
700ms goes. Variants toggle loss terms and the pallas/XLA rasterizer."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig
from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras
from sparse_view_3dgs_pack_tpu.train.optim import init_adam, init_exposure_adam
from sparse_view_3dgs_pack_tpu.train.step import (CameraBank, StepCarry,
                                                  StepConfig, train_step)

W = H = 800
N = 100_000
rng = np.random.default_rng(0)
pts = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
cols = rng.random((N, 3)).astype(np.float32)
state0 = gm.create_from_pcd(pts, cols, n_images=4, sh_degree=3)
cams = make_orbit_cameras(4, radius=6.0, width=W, height_px=H)
for c in cams:
    c.image = rng.random((H, W, 3)).astype(np.float32)
    c.alpha_mask = np.ones((H, W), np.float32)
bank = CameraBank.from_cameras(cams)
raster = RasterConfig(max_pairs=1 << 19, max_per_tile=1024, tile_batch=128)

def run_variant(label, **kw):
    cfg = StepConfig(width=W, height=H, sh_degree=3, raster=raster, **kw)
    state = state0
    adam = init_adam(state.params)
    ea = init_exposure_adam(state.exposure)
    carry = StepCarry(dwt_running_mean=jnp.ones(()))
    lrs = {k: jnp.asarray(1e-4) for k in state.params}

    def one(i, s, a, e, c):
        return train_step(s, a, e, c, bank, jnp.asarray(i % 4, jnp.int32),
                          lrs, jnp.asarray(0.0), jnp.asarray(0.0),
                          jnp.asarray(3, jnp.int32), jnp.zeros(3), cfg)

    t0 = time.perf_counter()
    out = one(0, state, adam, ea, carry)
    _ = np.asarray(out.state.params["xyz"][0, 0])
    compile_s = time.perf_counter() - t0
    state, adam, ea, carry = out.state, out.adam, out.exp_adam, out.carry
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(1, 9):
            out = one(i, state, adam, ea, carry)
            state, adam, ea, carry = (out.state, out.adam, out.exp_adam,
                                      out.carry)
        _ = np.asarray(state.params["xyz"][0, 0])
        best = min(best, (time.perf_counter() - t0) / 8)
    log(f"{label}: {best*1000:7.1f} ms/it  (compile {compile_s:.0f}s)")

run_variant("pallas, photometric only", use_pallas=True)
run_variant("pallas, +dwt", use_pallas=True, dwt_enable=True)
run_variant("pallas, +dwt +patch", use_pallas=True, dwt_enable=True,
            patch_dwt_enable=True)
log("done")
