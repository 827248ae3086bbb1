#!/usr/bin/env python3
"""A/B: does the offline warped pseudo-view distillation substitute
(`depth/warp.py` — affine-align + forward-warp the nearest train view's
precomputed prior) measurably help sparse-view FSGS training, the way the
reference's live MiDaS-on-render distillation does
(`FSGS/train.py:116-131`)?

Protocol: one synthetic scene with ground-truth multi-view renders and
true-depth-derived mono priors (`scripts/tpu_sweep.build_scene` with
depth_priors=True), trained few-shot (4 views) twice with identical seeds —
(A) pseudo-view distillation ON, (B) OFF — then held-out test-view PSNR for
both. Everything else (train-view depth prior, densify schedule, lrs) is
identical. Results land in <workdir>/fsgs_ab.json and PARITY.md.

Usage: python scripts/fsgs_ab.py [workdir] [--iters N] [--size W]
"""
import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np  # noqa: E402


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _args(scene_dir, model_path, size):
    return _NS(source_path=scene_dir, model_path=model_path,
               images="images", depths="", white_background=False,
               eval=True, train_test_exp=False, data_device="cpu",
               resolution=-1, sh_degree=2, save_iterations=[],
               test_iterations=[], checkpoint_iterations=[],
               depth_estimator="precomputed", n_views=4,
               dataset_type="blender")


def _opt(iters, pseudo_on):
    opt = _NS(
        iterations=iters, position_lr_init=0.00016,
        position_lr_final=0.0000016, position_lr_delay_mult=0.01,
        position_lr_max_steps=iters, feature_lr=0.0025, opacity_lr=0.05,
        scaling_lr=0.005, rotation_lr=0.001, exposure_lr_init=0.0,
        exposure_lr_final=0.0, exposure_lr_delay_steps=0,
        exposure_lr_delay_mult=0.0, percent_dense=0.01, lambda_dssim=0.2,
        densification_interval=100, opacity_reset_interval=3000,
        densify_from_iter=100, densify_until_iter=iters,
        densify_grad_threshold=0.0005, depth_weight=0.05,
        proximity_until_iter=min(2000, iters), dist_thres=10.0,
        random_background=False)
    if pseudo_on:
        opt.depth_pseudo_weight = 1.0
        opt.sample_pseudo_interval = 1
        opt.start_sample_pseudo = 100
        opt.end_sample_pseudo = iters
    else:
        opt.depth_pseudo_weight = 0.0
        opt.sample_pseudo_interval = 10**9
        opt.start_sample_pseudo = 10**9
        opt.end_sample_pseudo = 10**9 + 1
    return opt


_PIPE = dict(convert_SHs_python=False, compute_cov3D_python=False,
             debug=False, antialiasing=False, max_pairs=0, max_per_tile=0,
             tile_batch=64)


def run_one(scene_dir, model_path, iters, pseudo_on, size):
    import random

    import jax
    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu.renderer import (default_raster_config,
                                                    render_core)
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import train_fsgs
    from sparse_view_3dgs_pack_tpu.utils.image import psnr as psnr_fn

    os.makedirs(model_path, exist_ok=True)
    args = _args(scene_dir, model_path, size)
    random.seed(0)
    np.random.seed(0)
    scene = train_fsgs(args, _opt(iters, pseudo_on), _NS(**_PIPE), args)

    state = scene.gaussians
    cfg = default_raster_config(state.capacity, size, size)
    psnrs = []
    for cam in scene.getTestCameras():
        res = render_core(state.params, state.alive.astype(jnp.float32),
                          jnp.eye(3, 4), cam.params(), size, size,
                          jnp.zeros(3), jnp.asarray(args.sh_degree,
                                                    jnp.int32), cfg,
                          inference=True,
                          use_pallas=jax.default_backend() not in ("cpu",))
        gt = jnp.asarray(cam.image)
        psnrs.append(float(psnr_fn(jnp.clip(res.render, 0, 1), gt)))
    return float(np.mean(psnrs)), int(state.n_alive)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/fsgs_ab")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS; this sets the config "
                         "before first jax use)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tpu_sweep import build_scene

    os.makedirs(args.workdir, exist_ok=True)
    scene_dir = os.path.join(args.workdir, "scene")
    if os.path.exists(scene_dir):
        shutil.rmtree(scene_dir)
    os.makedirs(scene_dir)
    build_scene(scene_dir, seed=7, w=args.size, n_train=4, n_test=4,
                n_gauss=1200, depth_priors=True)

    results = {}
    for tag, on in (("pseudo_on", True), ("pseudo_off", False)):
        psnr, n_alive = run_one(scene_dir, os.path.join(args.workdir, tag),
                                args.iters, on, args.size)
        results[tag] = {"test_psnr": round(psnr, 3), "n_alive": n_alive}
        print(f"[ab] {tag}: PSNR {psnr:.3f}  n_alive {n_alive}", flush=True)

    results["delta_psnr"] = round(results["pseudo_on"]["test_psnr"]
                                  - results["pseudo_off"]["test_psnr"], 3)
    with open(os.path.join(args.workdir, "fsgs_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
