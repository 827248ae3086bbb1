#!/usr/bin/env python3
"""Bisect the TPU backward kernel: compare per-PAIR gradients (pre
segment-sum) against numpy for each tile, and report which rows break."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_bwd import rasterize_backward_pallas
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import _tile_pack

W,H,N = 64,48,250
GRID_X = (W+15)//16
NT = GRID_X*((H+15)//16)
PIX, CHUNK = 256, 256
LOG_EPS = -9.210340371976182

cloud = make_gaussian_cloud(1, N, extent=1.0, scale_range=(0.02,0.1))
cam = make_orbit_cameras(1, radius=4.0, width=W, height_px=H)[0]
p = cam.params()
proj = project_gaussians(
    means3d=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
    quats=jnp.asarray(cloud["quats"]), opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:,0])),
    viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
    cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
    tan_fovy=float(p.tan_fovy), width=W, height=H, sh=jnp.asarray(cloud["features"]), sh_degree=0)
MP = 1<<13
ba = bin_gaussians_aligned(proj.means2d, proj.depths, proj.radii, W, H, MP)
pd = pr.pack_pair_data(proj, ba.ids)
bg = jnp.zeros(3)

raw = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5)
jax.block_until_ready(raw); log("fwd done")

key = jax.random.PRNGKey(3)
gimg = jax.random.normal(key, (H, W, 8)) * jnp.array([1,1,1,0.3,0.3,0,0,0])
galpha = jax.random.normal(jax.random.PRNGKey(4), (H, W, 1)) * 0.3
g_tiles = _tile_pack(gimg, W, H, 8)
ga_tiles = _tile_pack(galpha, W, H, 1)
aux3 = jnp.concatenate([raw[:, :, 8:10], ga_tiles], axis=-1)
bg_row = jnp.zeros((1, 8))
d_pairs = rasterize_backward_pallas(pd, ba.tile_starts, ba.tile_counts,
                                    g_tiles, aux3, bg_row, W, H)
d_pairs = np.asarray(d_pairs); log("bwd done")

pdn = np.asarray(pd); g_t = np.asarray(g_tiles); ga_t = np.asarray(ga_tiles)
aux_n = np.asarray(raw[:, :, 8:10])
starts = np.asarray(ba.tile_starts); counts = np.asarray(ba.tile_counts)

ROWNAMES = ["mx","my","a","b","c","op"] + [f"pl{i}" for i in range(8)]
worst_by_row = np.zeros(14)
for t in range(NT):
    s, cnt = int(starts[t]), int(counts[t])
    nch = (cnt + CHUNK - 1)//CHUNK
    px = ((np.arange(256) % 16)).astype(np.float64)[:, None]
    py = ((np.arange(256) // 16)).astype(np.float64)[:, None]
    txf, tyf = (t % GRID_X)*16, (t//GRID_X)*16
    g = g_t[t].astype(np.float64)      # (256, 8)
    log_tf = aux_n[t][:, 0:1].astype(np.float64)
    ncon = aux_n[t][:, 1:2].astype(np.float64)
    g_a = ga_t[t][:, 0:1].astype(np.float64)
    t_fin = np.exp(log_tf)
    B = t_fin * (0.0 - g_a)            # bg zero
    c_log = np.zeros((256, 1)); s_car = np.zeros((256, 1))
    exp_grads = np.zeros((14, nch*CHUNK))
    for i in range(nch):
        k = nch - 1 - i
        cols = pdn[:, s+k*CHUNK : s+(k+1)*CHUNK].astype(np.float64)
        mx = cols[0:1] - txf; my = cols[1:2] - tyf
        ca, cb, cc, op = cols[2:3], cols[3:4], cols[4:5], cols[5:6]
        payload = cols[6:14]
        dx = px - mx; dy = py - my
        power = -0.5*(ca*dx*dx + cc*dy*dy) - cb*dx*dy
        G = np.exp(np.minimum(power, 0.0))
        araw = op*G
        clamped = araw > 0.99
        alpha = np.minimum(0.99, araw)
        gidx = np.arange(CHUNK)[None,:] + k*CHUNK
        contrib = (gidx < ncon) & (power <= 0) & (alpha >= 1/255.) & (gidx < cnt)
        alpha = np.where(contrib, alpha, 0.0)
        l1m = np.log1p(-alpha)
        r_incl = np.cumsum(l1m[:, ::-1], axis=1)[:, ::-1]
        T = np.exp(log_tf - r_incl - c_log)
        w = alpha * T
        gc = g @ payload               # (256, CHUNK)
        wgc = w * gc
        suffix = (np.cumsum(wgc[:, ::-1], axis=1)[:, ::-1] - wgc) + s_car
        one_m = np.maximum(1-alpha, 1e-6)
        dalpha = np.where(contrib, T*gc - (suffix + B)/one_m, 0.0)
        live = contrib & ~clamped
        dop = np.where(live, dalpha*G, 0.0)
        q = np.where(live, dalpha*alpha, 0.0)
        sq = q.sum(0, keepdims=True)
        sqx = (q*px).sum(0, keepdims=True); sqy = (q*py).sum(0, keepdims=True)
        sqx2 = (q*px*px).sum(0, keepdims=True); sqy2 = (q*py*py).sum(0, keepdims=True)
        sqxy = (q*px*py).sum(0, keepdims=True)
        s_qdx = sqx - mx*sq; s_qdy = sqy - my*sq
        s_qdx2 = sqx2 - 2*mx*sqx + mx*mx*sq
        s_qdy2 = sqy2 - 2*my*sqy + my*my*sq
        s_qdxdy = sqxy - my*sqx - mx*sqy + mx*my*sq
        exp_grads[0, k*CHUNK:(k+1)*CHUNK] = (ca*s_qdx + cb*s_qdy)
        exp_grads[1, k*CHUNK:(k+1)*CHUNK] = (cc*s_qdy + cb*s_qdx)
        exp_grads[2, k*CHUNK:(k+1)*CHUNK] = -0.5*s_qdx2
        exp_grads[3, k*CHUNK:(k+1)*CHUNK] = -s_qdxdy
        exp_grads[4, k*CHUNK:(k+1)*CHUNK] = -0.5*s_qdy2
        exp_grads[5, k*CHUNK:(k+1)*CHUNK] = dop.sum(0)
        exp_grads[6:14, k*CHUNK:(k+1)*CHUNK] = g.T @ w
        c_log = c_log + np.where(contrib, l1m, 0).sum(1, keepdims=True)
        s_car = s_car + wgc.sum(1, keepdims=True)
    got = d_pairs[:14, s:s+nch*CHUNK]
    diff = np.abs(got - exp_grads)
    scale = np.maximum(np.abs(exp_grads).max(axis=1, keepdims=True), 1e-3)
    rel = (diff/scale).max(axis=1)
    worst_by_row = np.maximum(worst_by_row, rel)
    if rel.max() > 1e-2:
        r = int(rel.argmax())
        j = int((diff[r]/scale[r]).argmax())
        log(f"tile {t}: row {ROWNAMES[r]} rel {rel.max():.3f} at pair {j} got {got[r,j]:.5f} want {exp_grads[r,j]:.5f}")
for r in range(14):
    log(f"row {ROWNAMES[r]:4s} worst rel {worst_by_row[r]:.2e}")
log("done")
