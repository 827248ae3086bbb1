#!/usr/bin/env python3
"""Compare pallas vs XLA gradients at a real mid-training state (where the
pallas-path run degraded)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.data.readers import read_nerf_synthetic_scene
from sparse_view_3dgs_pack_tpu.data.camera_utils import camera_list_from_cam_infos
from sparse_view_3dgs_pack_tpu.renderer import render_core, default_raster_config
from sparse_view_3dgs_pack_tpu.data.cameras import CameraParams
from sparse_view_3dgs_pack_tpu.losses.photometric import l1_loss

state = gm.load_ply("/tmp/big_nodens/point_cloud/iteration_2500/point_cloud.ply",
                    sh_degree=3)
log("loaded", int(state.n_alive), "gaussians; cap", state.capacity)

class Args:
    resolution = -1; white_background = False; train_test_exp = False
info = read_nerf_synthetic_scene("/tmp/big_scene", eval=True)
cams = camera_list_from_cam_infos(info.train_cameras, 1.0, Args(), True, False)
cam = cams[0]
W, H = cam.width, cam.height
gt = jnp.asarray(cam.image[..., :3])
cfg = default_raster_config(state.capacity, W, H)
camp = CameraParams(*map(jnp.asarray, cam.params()))
alive = state.alive.astype(jnp.float32)

def loss(params, use_pallas):
    res = render_core(params, alive, jnp.eye(3, 4), camp, W, H,
                      jnp.zeros(3), sh_degree_active=3, config=cfg,
                      use_pallas=use_pallas)
    return l1_loss(res.render, gt)

gp = jax.jit(jax.grad(lambda p: loss(p, True)))(state.params)
gx = jax.jit(jax.grad(lambda p: loss(p, False)))(state.params)
jax.block_until_ready((gp, gx))
lp = float(jax.jit(lambda p: loss(p, True))(state.params))
lx = float(jax.jit(lambda p: loss(p, False))(state.params))
log(f"loss pallas {lp:.6f} vs xla {lx:.6f}")
n = int(state.n_alive)
for k in gp:
    a, b = np.asarray(gp[k])[:n], np.asarray(gx[k])[:n]
    sc = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b) / sc
    # relative bias: mean signed difference vs mean |grad|
    bias = (a - b).mean() / max(np.abs(b).mean(), 1e-12)
    log(f"{k}: relmax {rel.max():.2e} rel-q99 {np.quantile(rel,0.99):.2e} "
        f"bias {bias:+.2e} |g|xla {np.abs(b).mean():.3e}")
    if rel.max() > 3e-3:
        i = int(np.unravel_index(rel.argmax(), rel.shape)[0])
        log(f"   worst gaussian {i}: pallas {a.reshape(n,-1)[i][:4]} "
            f"xla {b.reshape(n,-1)[i][:4]}")
        log(f"   its params: xyz {np.asarray(state.params['xyz'])[i]}, "
            f"scale {np.exp(np.asarray(state.params['scaling'])[i])}, "
            f"opac {1/(1+np.exp(-np.asarray(state.params['opacity'])[i,0])):.4f}")
log("done")
