import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import isolation

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig, rasterize

W = H = 64


def _render_cloud(cloud, cam):
    p = cam.params()
    proj = project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]),
        scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center),
        tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
        width=W, height=H, sh=jnp.asarray(cloud["features"]), sh_degree=0)
    return rasterize(proj, W, H, jnp.zeros(3),
                     RasterConfig(max_pairs=1 << 14, max_per_tile=256,
                                  tile_batch=8)).color


def _write_scene(root, n_views=8):
    """Blender-format scene whose images are real renders of a gaussian cloud."""
    from PIL import Image as PILImage
    cloud = testing.make_gaussian_cloud(7, 400, extent=0.9,
                                        scale_range=(0.05, 0.15))
    cams = testing.make_orbit_cameras(n_views, radius=3.5, width=W,
                                      height_px=H)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i, cam in enumerate(cams):
        img = np.asarray(_render_cloud(cloud, cam))
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        name = f"./train/r_{i}"
        PILImage.fromarray(arr).save(os.path.join(root, f"train/r_{i}.png"))
        w2c = np.eye(4)
        w2c[:3, :3] = cam.R.T
        w2c[:3, 3] = cam.T
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": cams[0].fovx, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    # init point cloud near the gaussians
    from sparse_view_3dgs_pack_tpu.data.ply import store_point_cloud
    rng = np.random.default_rng(0)
    sel = rng.choice(len(cloud["xyz"]), 200, replace=False)
    store_point_cloud(os.path.join(root, "points3d.ply"),
                      cloud["xyz"][sel] + rng.normal(0, 0.05, (200, 3)),
                      rng.random((200, 3)))
    return root


class _Args:
    sh_degree = 2
    source_path = ""
    model_path = ""
    images = "images"
    depths = ""
    resolution = 1
    white_background = False
    train_test_exp = False
    data_device = "tpu"
    eval = False
    n_views = 0
    point_cloud_type = "sparse"


class _Opt:
    iterations = 60
    position_lr_init = 0.0016
    position_lr_final = 0.000016
    position_lr_delay_mult = 0.01
    position_lr_max_steps = 60
    feature_lr = 0.025
    opacity_lr = 0.05
    scaling_lr = 0.01
    rotation_lr = 0.002
    exposure_lr_init = 0.0
    exposure_lr_final = 0.0
    exposure_lr_delay_steps = 0
    exposure_lr_delay_mult = 0.0
    percent_dense = 0.01
    lambda_dssim = 0.2
    densification_interval = 20
    opacity_reset_interval = 1000
    densify_from_iter = 10
    densify_until_iter = 50
    densify_grad_threshold = 0.0002
    depth_l1_weight_init = 0.0
    depth_l1_weight_final = 0.0
    random_background = False
    optimizer_type = "default"
    dwt_enable = True
    dwt_ll1_weight = 1.0
    dwt_lh1_weight = 1.0
    dwt_hl1_weight = 1.0
    dwt_hh1_weight = 0.0
    dwt_ll2_weight = 0.0
    dwt_lh2_weight = 0.0
    dwt_hl2_weight = 0.0
    dwt_hh2_weight = 0.0
    patch_dwt_enable = True
    patch_dwt_weight = 0.1
    patch_size = 32
    patch_percentile = 0.2
    patch_dwt_lh1_weight = 1.0
    patch_dwt_hl1_weight = 1.0


class _Pipe:
    convert_SHs_python = False
    compute_cov3D_python = False
    debug = False
    antialiasing = False
    max_pairs = 1 << 14
    max_per_tile = 256
    tile_batch = 8


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_scene"))
    return _write_scene(root)


# The three big-compile loop tests run in isolated child processes (see
# tests/isolation.py for why); the *_child bodies are what actually runs.

@pytest.mark.timeout(3200)
def test_train_e2e_lgdwt():
    isolation.run_isolated(
        "tests/test_train_e2e.py::test_train_e2e_lgdwt_child")


@pytest.mark.timeout(3200)
def test_densification_changes_count():
    isolation.run_isolated(
        "tests/test_train_e2e.py::test_densification_changes_count_child")


@pytest.mark.timeout(3200)
def test_train_e2e_fsgs():
    isolation.run_isolated(
        "tests/test_train_e2e.py::test_train_e2e_fsgs_child")


@isolation.child_only
@pytest.mark.timeout(600)
def test_train_e2e_lgdwt_child(scene_dir, tmp_path):
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "model")
    os.makedirs(args.model_path, exist_ok=True)

    scene = Scene(args, sh_degree=args.sh_degree)
    trainer = Trainer(scene, _Opt(), _Pipe(), args, method="lgdwt",
                      quiet=True)

    stats0 = trainer.evaluate(scene.getTrainCameras()[:3])
    losses = []
    for _ in range(_Opt.iterations):
        m = trainer.step()
        losses.append(float(m["loss"]))
    stats1 = trainer.evaluate(scene.getTrainCameras()[:3])

    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10])
    assert stats1["psnr"] > stats0["psnr"] + 2.0

    # artefact saving works
    trainer.save_scene(60)
    assert os.path.exists(os.path.join(
        args.model_path, "point_cloud", "iteration_60", "point_cloud.ply"))
    assert os.path.exists(os.path.join(args.model_path, "exposure.json"))

    # checkpoint roundtrip
    ck = os.path.join(args.model_path, "chkpnt60.npz")
    trainer.save_checkpoint(ck)
    psnr_before = stats1["psnr"]
    trainer.restore_checkpoint(ck)
    stats2 = trainer.evaluate(scene.getTrainCameras()[:3])
    assert stats2["psnr"] == pytest.approx(psnr_before, abs=0.01)


@isolation.child_only
def test_densification_changes_count_child(scene_dir, tmp_path):
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "model2")
    os.makedirs(args.model_path, exist_ok=True)
    opt = _Opt()
    opt.densify_grad_threshold = 0.00001  # aggressive

    scene = Scene(args, sh_degree=args.sh_degree)
    trainer = Trainer(scene, opt, _Pipe(), args, method="lgdwt", quiet=True)
    n0 = int(trainer.state.n_alive)
    for _ in range(40):
        trainer.step()
    n1 = int(trainer.state.n_alive)
    assert n1 != n0  # clone/split/prune actually fired


@isolation.child_only
def test_train_e2e_fsgs_child(scene_dir, tmp_path):
    """Full train_fsgs loop: depth priors from precomputed maps, warped
    pseudo-view distillation, proximity + dist-split densification."""
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import train_fsgs

    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "fsgs")
    args.save_iterations = []
    args.depth_estimator = "precomputed"
    os.makedirs(args.model_path, exist_ok=True)
    # synthesize precomputed depth priors (any smooth map works — the loss
    # is correlation-based)
    ddir = os.path.join(scene_dir, "depth_maps")
    os.makedirs(ddir, exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for i in range(8):
        np.save(os.path.join(ddir, f"r_{i}.npy"), 1.0 + 0.1 * (xx + yy) / W)

    opt = _Opt()
    opt.iterations = 40
    opt.depth_weight = 0.05
    opt.depth_pseudo_weight = 1.0
    opt.sample_pseudo_interval = 5
    opt.start_sample_pseudo = 5
    opt.end_sample_pseudo = 1000
    opt.densification_interval = 10
    opt.densify_from_iter = 5
    opt.densify_until_iter = 40
    opt.proximity_until_iter = 40
    opt.dist_thres = 10.0

    scene = train_fsgs(args, opt, _Pipe(), args)
    assert int(scene.gaussians.n_alive) > 0
    res = np.asarray(scene.gaussians.params["xyz"][:int(scene.gaussians.n_alive)])
    assert np.isfinite(res).all()
