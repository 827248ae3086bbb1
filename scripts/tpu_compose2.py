#!/usr/bin/env python3
"""Fusion experiments: where do composed gathers fall off the fast path?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned, bin_gaussians

W = H = 800
N = 100_000
MP = 1 << 21
cloud = make_gaussian_cloud(0, N, extent=2.0, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
c0 = {k: jnp.asarray(v) for k, v in cloud.items()}

def proj_of(cc):
    return project_gaussians(
        means3d=cc["xyz"], scales=jnp.exp(cc["scales"]), quats=cc["quats"],
        opacities=jax.nn.sigmoid(cc["opacity"][:, 0]),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
        tan_fovy=float(p.tan_fovy), width=W, height=H, sh=cc["features"],
        sh_degree=0)

def chain(f, init, label, n=6):
    s = f(init)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")

def mut(cc, v):
    out = dict(cc)
    out["xyz"] = cc["xyz"] + 1e-9 * v
    return out

def rows_of(pr_):
    safe_depth = jnp.where(jnp.isfinite(pr_.depths), pr_.depths, 1.0)
    cols = [pr_.means2d[:, 0], pr_.means2d[:, 1], pr_.conics[:, 0],
            pr_.conics[:, 1], pr_.conics[:, 2], pr_.opacities]
    cols += [pr_.colors[:, c] for c in range(3)]
    cols += [1.0 / safe_depth, safe_depth]
    while len(cols) < 16:
        cols.append(jnp.zeros_like(safe_depth))
    rows = jnp.stack(cols, axis=1)
    return jnp.concatenate([rows, jnp.zeros((1, 16))], axis=0)

def variant(name, barrier_ids, barrier_rows, no_transpose=False):
    @jax.jit
    def f(cc):
        pr_ = proj_of(cc)
        ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
        rows = rows_of(pr_)
        ids_c = jnp.where(ba.ids >= 0, ba.ids, rows.shape[0] - 1)
        if barrier_ids:
            ids_c = jax.lax.optimization_barrier(ids_c)
        if barrier_rows:
            rows = jax.lax.optimization_barrier(rows)
        data = rows[ids_c]
        if not no_transpose:
            data = jax.lax.optimization_barrier(data).T
        return mut(cc, jnp.sum(data[0, ::65536]))
    chain(f, c0, name)

variant("pack composed (no barriers, no T)", False, False, no_transpose=True)
variant("pack composed (barrier ids, no T)", True, False, no_transpose=True)
variant("pack composed (barrier both, no T)", True, True, no_transpose=True)
variant("pack composed (barrier both, +T)", True, True, no_transpose=False)

# aligned binning internals composed
@jax.jit
def f_parts(cc):
    pr_ = proj_of(cc)
    b = bin_gaussians(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    pad = (-b.tile_counts) % 256
    cum_pad = jnp.cumsum(pad) - pad
    slot = jnp.arange(MP, dtype=jnp.int32)
    pair_tile = jnp.searchsorted(b.tile_starts, slot, side="right") - 1
    return mut(cc, jnp.sum(pair_tile[::65536]).astype(jnp.float32))
chain(f_parts, c0, "bin + searchsorted(2M vs 8160)")

@jax.jit
def f_parts2(cc):
    pr_ = proj_of(cc)
    b = bin_gaussians(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    pad = (-b.tile_counts) % 256
    cum_pad = jnp.cumsum(pad) - pad
    slot = jnp.arange(MP, dtype=jnp.int32)
    pair_tile = jnp.clip(jnp.searchsorted(b.tile_starts, slot,
                                          side="right") - 1, 0, 2499)
    new_idx = slot + cum_pad[pair_tile]
    return mut(cc, jnp.sum(new_idx[::65536]).astype(jnp.float32))
chain(f_parts2, c0, "+ cum_pad gather (2M from 8160)")

@jax.jit
def f_parts3(cc):
    pr_ = proj_of(cc)
    ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    return mut(cc, ba.total_pairs.astype(jnp.float32))
chain(f_parts3, c0, "full aligned binning (scatter incl)")
log("done")
