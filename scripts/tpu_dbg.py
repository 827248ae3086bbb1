#!/usr/bin/env python3
"""Bisect the TPU-compile mismatch: dump per-pair alpha from kernels of
increasing structural similarity to the real forward kernel."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr

W,H,N = 64,48,300
cloud = make_gaussian_cloud(0, N, extent=1.0, scale_range=(0.02,0.1))
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
jax.block_until_ready(pd); log("packed; counts:", np.asarray(ba.tile_counts).tolist())

PIX, CHUNK, TILE = 256, 256, 16
GRID_X = (W + 15)//16
NT = GRID_X * ((H+15)//16)

def alpha_np(t):
    d = np.asarray(pd)
    s = int(ba.tile_starts[t]); cnt = int(ba.tile_counts[t])
    cols = d[:, s:s+CHUNK]
    pidx = np.arange(256)
    px = ((t % GRID_X)*16 + pidx % 16).astype(np.float32)[:, None]
    py = ((t // GRID_X)*16 + pidx // 16).astype(np.float32)[:, None]
    dx = px - cols[0][None]; dy = py - cols[1][None]
    power = -0.5*(cols[2][None]*dx*dx + cols[4][None]*dy*dy) - cols[3][None]*dx*dy
    G = np.exp(np.minimum(power, 0.0))
    a = np.minimum(0.99, cols[5][None]*G)
    lanev = np.arange(CHUNK)[None, :] < cnt
    a = np.where((power > 0) | (a < 1/255.) | ~lanev, 0.0, a)
    return a

def make_kernel(with_loop):
    def kern(starts_ref, counts_ref, hbm, pix_ref, out_ref, buf, sems):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        tx = ((t % GRID_X) * TILE).astype(jnp.float32)
        ty = ((t // GRID_X) * TILE).astype(jnp.float32)
        px = pix_ref[:, 0:1] + tx
        py = pix_ref[:, 1:2] + ty
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def dma(slot, k):
            off = pl.multiple_of(start + k * CHUNK, 128)
            return pltpu.make_async_copy(hbm.at[:, pl.ds(off, CHUNK)],
                                         buf.at[slot], sems.at[slot])

        def compute(k, d):
            mx = d[0:1, :]; my = d[1:2, :]
            ca = d[2:3, :]; cb = d[3:4, :]; cc = d[4:5, :]; op = d[5:6, :]
            dx = px - mx; dy = py - my
            power = -0.5*(ca*dx*dx + cc*dy*dy) - cb*dx*dy
            G = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(0.99, op * G)
            valid = (lane + k*CHUNK) < count
            return jnp.where((power > 0.0) | (alpha < 1/255.) | ~valid, 0.0, alpha)

        if not with_loop:
            cp = dma(0, 0)
            cp.start(); cp.wait()
            out_ref[0] = compute(0, buf[0])
        else:
            n_chunks = jnp.minimum((count + CHUNK - 1)//CHUNK, 64)
            @pl.when(n_chunks > 0)
            def _():
                dma(0, 0).start()
            def body(state):
                k, acc = state
                slot = k % 2
                @pl.when(k + 1 < n_chunks)
                def _():
                    dma((k+1) % 2, k+1).start()
                dma(slot, k).wait()
                a = compute(k, buf[slot])
                return k+1, jnp.where(k == 0, a, acc)
            def cond(state):
                k, _ = state
                return k < n_chunks
            k, acc = jax.lax.while_loop(cond, body,
                                        (jnp.asarray(0, jnp.int32),
                                         jnp.zeros((PIX, CHUNK), jnp.float32)))
            @pl.when(k < n_chunks)
            def _():
                dma(k % 2, k).wait()
            out_ref[0] = acc
    return kern

for with_loop in (False, True):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, PIX, CHUNK), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 16, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    out = pl.pallas_call(make_kernel(with_loop), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NT, PIX, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(ba.tile_starts, ba.tile_counts, pd, pr.tile_pixel_coords())
    out = np.asarray(out)
    worst = 0.0
    for t in range(NT):
        ref = alpha_np(t)
        dmax = np.abs(out[t] - ref).max()
        worst = max(worst, dmax)
        if dmax > 1e-4:
            bad = np.argwhere(np.abs(out[t]-ref) > 1e-4)
            log(f"loop={with_loop} tile {t} alpha maxdiff {dmax:.4g} at", bad[:4].tolist(),
                "got", out[t][tuple(bad[0])], "want", ref[tuple(bad[0])])
            # row/col distribution of bad entries
            rows = sorted(set(bad[:,0].tolist()))[:12]
            cols = sorted(set(bad[:,1].tolist()))[:12]
            log(f"   bad rows {rows} cols {cols} nbad {len(bad)}")
            break
    log(f"variant with_loop={with_loop}: alpha worst diff {worst:.4g}")

# ---------- full blend of chunk 0 (no multi-chunk carry) ----------
def blend_kernel(starts_ref, counts_ref, hbm, pix_ref, out_ref, buf, sems):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    tx = ((t % GRID_X) * TILE).astype(jnp.float32)
    ty = ((t // GRID_X) * TILE).astype(jnp.float32)
    px = pix_ref[:, 0:1] + tx
    py = pix_ref[:, 1:2] + ty
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    triu = (row_i <= col_i).astype(jnp.float32)
    cp = pltpu.make_async_copy(hbm.at[:, pl.ds(pl.multiple_of(start, 128), CHUNK)], buf.at[0], sems.at[0])
    cp.start(); cp.wait()
    d = buf[0]
    mx = d[0:1, :]; my = d[1:2, :]
    ca = d[2:3, :]; cb = d[3:4, :]; cc = d[4:5, :]; op = d[5:6, :]
    dx = px - mx; dy = py - my
    power = -0.5*(ca*dx*dx + cc*dy*dy) - cb*dx*dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, op * G)
    valid = lane < count
    alpha = jnp.where((power > 0.0) | (alpha < 1/255.) | ~valid, 0.0, alpha)
    log1m = jnp.log1p(-alpha)
    s_incl = jax.lax.dot_general(log1m, triu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    contribute = s_incl >= -9.210340371976182
    s_excl = s_incl - log1m
    w = jnp.where(contribute, alpha * jnp.exp(s_excl), 0.0)
    payload = d[6:14, :]
    accum = jax.lax.dot_general(w, payload, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    log_t = jnp.sum(jnp.where(contribute, log1m, 0.0), axis=1, keepdims=True)
    nc = jnp.sum(contribute.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[0] = jnp.concatenate([accum, log_t, nc, jnp.zeros((PIX, CHUNK-10), jnp.float32)], axis=1)

gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(NT,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, PIX, CHUNK), lambda t, *_: (t, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((2, 16, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))])
out = pl.pallas_call(blend_kernel, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((NT, PIX, CHUNK), jnp.float32),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(ba.tile_starts, ba.tile_counts, pd, pr.tile_pixel_coords())
out = np.asarray(out)
d_all = np.asarray(pd)
worst = 0.0
for t in range(NT):
    a = alpha_np(t)
    log1m = np.log1p(-a)
    s_incl = np.cumsum(log1m, axis=1)
    contrib = s_incl >= -9.210340371976182
    s_excl = s_incl - log1m
    w = np.where(contrib, a*np.exp(s_excl), 0.0)
    s0 = int(ba.tile_starts[t])
    payload = d_all[6:14, s0:s0+CHUNK]
    accum = w @ payload.T
    logt = np.sum(np.where(contrib, log1m, 0), axis=1)
    dmax = max(np.abs(out[t][:, :8]-accum).max(), np.abs(out[t][:,8]-logt).max())
    if dmax > 1e-3:
        bad = np.argwhere(np.abs(out[t][:, :8]-accum) > 1e-3)
        log(f"blend tile {t} maxdiff {dmax:.4g} nbad {len(bad)} rows {sorted(set(bad[:,0].tolist()))[:10]}")
        r = bad[0][0]
        log("   row", r, "kernel", out[t][r,:10].round(4).tolist())
        log("   row", r, "expect", np.concatenate([accum[r], [logt[r]]]).round(4).tolist())
        log("   nc kernel", out[t][r,9], "expect", contrib[r].sum())
    worst = max(worst, dmax)
log("blend worst diff %.4g" % worst)

# ---------- the REAL kernel vs the same numpy expectation ----------
rout = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts,
                                   jnp.zeros(3), W, H, MP, 5)
rout = np.asarray(rout)
worst = 0.0
for t in range(NT):
    a = alpha_np(t)
    log1m = np.log1p(-a)
    s_incl = np.cumsum(log1m, axis=1)
    contrib = s_incl >= -9.210340371976182
    s_excl = s_incl - log1m
    w = np.where(contrib, a*np.exp(s_excl), 0.0)
    s0 = int(ba.tile_starts[t])
    payload = np.asarray(pd)[6:14, s0:s0+CHUNK]
    accum = w @ payload.T
    logt = np.sum(np.where(contrib, log1m, 0), axis=1)
    # count > 256 tiles need chunk 2 as well — handle
    cnt = int(ba.tile_counts[t])
    if cnt > CHUNK:
        cols2 = np.asarray(pd)[:, s0+CHUNK:s0+2*CHUNK]
        pidx = np.arange(256)
        px = ((t % GRID_X)*16 + pidx % 16).astype(np.float32)[:, None]
        py = ((t // GRID_X)*16 + pidx // 16).astype(np.float32)[:, None]
        dx = px - cols2[0][None]; dy = py - cols2[1][None]
        power = -0.5*(cols2[2][None]*dx*dx + cols2[4][None]*dy*dy) - cols2[3][None]*dx*dy
        G = np.exp(np.minimum(power, 0.0))
        a2 = np.minimum(0.99, cols2[5][None]*G)
        lv = (np.arange(CHUNK)[None,:]+CHUNK) < cnt
        a2 = np.where((power>0)|(a2<1/255.)|~lv, 0.0, a2)
        l2 = np.log1p(-a2)
        s2 = logt[:,None] + np.cumsum(l2, axis=1)
        c2 = s2 >= -9.210340371976182
        w2 = np.where(c2, a2*np.exp(s2-l2), 0.0)
        accum = accum + w2 @ cols2[6:14].T
        logt = logt + np.sum(np.where(c2, l2, 0), axis=1)
    dmax = max(np.abs(rout[t][:, :8]-accum).max(), np.abs(rout[t][:,8]-logt).max())
    if dmax > 1e-3:
        bad = np.argwhere(np.abs(rout[t][:, :8]-accum) > 1e-3)
        log(f"REAL tile {t} (cnt {cnt}) maxdiff {dmax:.4g} nbad {len(bad)}")
        r = bad[0][0] if len(bad) else 0
        log("   row", r, "kernel", rout[t][r,:10].round(4).tolist())
        log("   row", r, "expect", np.concatenate([accum[r], [logt[r]]]).round(4).tolist())
    worst = max(worst, dmax)
log("REAL kernel worst diff %.4g" % worst)
log("done")
