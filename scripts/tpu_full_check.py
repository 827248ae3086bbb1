#!/usr/bin/env python3
"""One-session TPU validation + perf sweep: fwd/bwd parity vs XLA autodiff,
then 1080p forward FPS and 800p train-step timing."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians, Projected
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig, rasterize_binned

# ---------- parity: fwd + grads vs XLA tiled autodiff (small scene) ----------
W, H = 64, 48
cloud = make_gaussian_cloud(1, 250, extent=1.0, scale_range=(0.02, 0.1))
cam = make_orbit_cameras(1, radius=4.0, width=W, height_px=H)[0]
cp = cam.params()

def proj_of(c):
    return project_gaussians(
        means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
        opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
        viewmat=jnp.asarray(cp.viewmat), full_proj=jnp.asarray(cp.full_proj),
        cam_center=jnp.asarray(cp.cam_center), tan_fovx=float(cp.tan_fovx),
        tan_fovy=float(cp.tan_fovy), width=W, height=H, sh=c["features"],
        sh_degree=0)

c = {k: jnp.asarray(v) for k, v in cloud.items()}
proj = proj_of(c)
MP = 1 << 13
ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
b = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
bg = jnp.array([0.1, 0.2, 0.3])
fn = make_pallas_rasterizer(W, H, 3)
gw = [jax.random.normal(k, s) for k, s in zip(
    jax.random.split(jax.random.PRNGKey(3), 4),
    [(H, W, 3), (H, W), (H, W), (H, W)])]

def loss_pallas(m2, dep, con, col, op):
    cc, invd, d, a = fn(m2, dep, con, col, op, ba.ids, ba.tile_starts,
                        ba.tile_counts, bg)
    return (jnp.sum(cc * gw[0]) + jnp.sum(invd * gw[1]) + jnp.sum(d * gw[2])
            + jnp.sum(a * gw[3]))

def loss_xla(m2, dep, con, col, op):
    pp = Projected(means2d=m2, depths=dep, radii=proj.radii, conics=con,
                   colors=col, opacities=op)
    r = rasterize_binned(pp, b, W, H, bg,
                         RasterConfig(max_pairs=MP, max_per_tile=256,
                                      tile_batch=4))
    return (jnp.sum(r.color * gw[0]) + jnp.sum(r.invdepth * gw[1])
            + jnp.sum(r.depth * gw[2]) + jnp.sum(r.alpha * gw[3]))

args = (proj.means2d, proj.depths, proj.conics, proj.colors, proj.opacities)
gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4)))(*args)
gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(*args)
jax.block_until_ready(gp)
mask = np.asarray(proj.radii) > 0
for g1, g2, name in zip(gp, gx, ("means2d", "depths", "conics", "colors",
                                 "opac")):
    a1, a2 = np.asarray(g1)[mask], np.asarray(g2)[mask]
    sc = max(np.abs(a2).max(), 1e-3)
    rel = np.abs(a1 - a2) / sc
    q = np.quantile(rel, [0.5, 0.9, 0.99, 1.0])
    frac = (rel > 5e-3).mean()
    log(f"grad {name}: rel q50={q[0]:.1e} q90={q[1]:.1e} q99={q[2]:.1e} "
        f"max={q[3]:.1e} frac>5e-3={frac:.4f}")

# also compare vs the dense oracle (pure elementwise — immune to TPU matmul
# precision quirks)
from sparse_view_3dgs_pack_tpu.ops.rasterize_ref import rasterize_dense
from sparse_view_3dgs_pack_tpu.ops.projection import Projected as _P

def loss_oracle(m2, dep, con, col, op):
    r = rasterize_dense(_P(means2d=m2, depths=dep, radii=proj.radii,
                           conics=con, colors=col, opacities=op), W, H, bg)
    return (jnp.sum(r.color * gw[0]) + jnp.sum(r.invdepth * gw[1])
            + jnp.sum(r.depth * gw[2]) + jnp.sum(r.alpha * gw[3]))

go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4)))(*args)
jax.block_until_ready(go)
for g1, g2, name in zip(gp, go, ("means2d", "depths", "conics", "colors",
                                 "opac")):
    a1, a2 = np.asarray(g1)[mask], np.asarray(g2)[mask]
    sc = max(np.abs(a2).max(), 1e-3)
    rel = np.abs(a1 - a2) / sc
    q = np.quantile(rel, [0.5, 0.99, 1.0])
    log(f"grad-vs-ORACLE {name}: q50={q[0]:.1e} q99={q[1]:.1e} max={q[2]:.1e}")
for g1, g2, name in zip(gx, go, ("means2d", "depths", "conics", "colors",
                                 "opac")):
    a1, a2 = np.asarray(g1)[mask], np.asarray(g2)[mask]
    sc = max(np.abs(a2).max(), 1e-3)
    rel = np.abs(a1 - a2) / sc
    q = np.quantile(rel, [0.5, 0.99, 1.0])
    log(f"XLA-vs-ORACLE {name}: q50={q[0]:.1e} q99={q[1]:.1e} max={q[2]:.1e}")
import sys; sys.exit(0)

# ---------- perf: 1080p forward ----------
W2, H2 = 1920, 1080
cloud2 = make_gaussian_cloud(0, 200_000, extent=2.5, scale_range=(0.004, 0.02))
cam2 = make_orbit_cameras(1, radius=6.0, width=W2, height_px=H2)[0]
p2 = cam2.params()
c2 = {k: jnp.asarray(v) for k, v in cloud2.items()}
MP2 = 1 << 21
fn2 = make_pallas_rasterizer(W2, H2, 3)

@jax.jit
def frame(c):
    pr = project_gaussians(
        means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
        opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
        viewmat=jnp.asarray(p2.viewmat), full_proj=jnp.asarray(p2.full_proj),
        cam_center=jnp.asarray(p2.cam_center), tan_fovx=float(p2.tan_fovx),
        tan_fovy=float(p2.tan_fovy), width=W2, height=H2, sh=c["features"],
        sh_degree=0)
    bb = bin_gaussians(pr.means2d, pr.depths, pr.radii, W2, H2, MP2)
    col, _, _, _ = fn2(pr.means2d, pr.depths, pr.conics, pr.colors,
                       pr.opacities, bb.ids, bb.tile_starts, bb.tile_counts,
                       jnp.zeros(3))
    return col

img = frame(c2); jax.block_until_ready(img)
log("1080p frame compiled; mean:", float(img.mean()))
t0 = time.perf_counter()
for _ in range(30):
    img = frame(c2)
jax.block_until_ready(img)
dt = (time.perf_counter() - t0) / 30
log(f"1080p e2e frame: {dt*1000:.2f} ms ({1/dt:.1f} fps)")

# ---------- perf: fwd+bwd at 800p (train-like) ----------
W3 = H3 = 800
cloud3 = make_gaussian_cloud(0, 100_000, extent=2.0, scale_range=(0.004, 0.02))
cam3 = make_orbit_cameras(1, radius=6.0, width=W3, height_px=H3)[0]
p3 = cam3.params()
c3 = {k: jnp.asarray(v) for k, v in cloud3.items()}
fn3 = make_pallas_rasterizer(W3, H3, 3)
target = jax.random.uniform(jax.random.PRNGKey(0), (H3, W3, 3))

@jax.jit
def train_like(c):
    pr = project_gaussians(
        means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
        opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
        viewmat=jnp.asarray(p3.viewmat), full_proj=jnp.asarray(p3.full_proj),
        cam_center=jnp.asarray(p3.cam_center), tan_fovx=float(p3.tan_fovx),
        tan_fovy=float(p3.tan_fovy), width=W3, height=H3, sh=c["features"],
        sh_degree=0)
    bb = bin_gaussians(pr.means2d, pr.depths, pr.radii, W3, H3, MP2)

    def loss(c):
        pr2 = project_gaussians(
            means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
            opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
            viewmat=jnp.asarray(p3.viewmat),
            full_proj=jnp.asarray(p3.full_proj),
            cam_center=jnp.asarray(p3.cam_center),
            tan_fovx=float(p3.tan_fovx), tan_fovy=float(p3.tan_fovy),
            width=W3, height=H3, sh=c["features"], sh_degree=0)
        col, _, _, _ = fn3(pr2.means2d, pr2.depths, pr2.conics, pr2.colors,
                           pr2.opacities, bb.ids, bb.tile_starts,
                           bb.tile_counts, jnp.zeros(3))
        return jnp.abs(col - target).mean()

    return jax.grad(lambda cc: loss(cc))({k: v for k, v in c.items()})

g = train_like(c3); jax.block_until_ready(g)
log("800p fwd+bwd compiled")
t0 = time.perf_counter()
for _ in range(20):
    g = train_like(c3)
jax.block_until_ready(g)
dt = (time.perf_counter() - t0) / 20
log(f"800p render fwd+bwd: {dt*1000:.2f} ms ({1/dt:.1f} it/s upper bound)")
log("done")
