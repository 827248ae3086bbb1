"""Synthetic scene fixtures for tests and benchmarks.

No datasets ship with this repo, so tests and `bench.py` build tiny synthetic
scenes: random colored Gaussian clouds, orbiting pinhole cameras, and on-disk
COLMAP/Blender scene trees exercising the real IO paths.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from .data import colmap
from .data.ply import store_point_cloud
from .utils.graphics import fov2focal


def look_at_rt(eye, target, up=(0.0, 0.0, 1.0)):
    """Returns (R, T) in the dataset-reader convention: R = cam→world rotation
    (transposed world→cam), T = world→cam translation. Camera looks down +z."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    Rw2c = np.stack([right, down, fwd], axis=0)  # world→cam
    T = -Rw2c @ eye
    return Rw2c.T, T  # stored convention transposes back


def make_orbit_cameras(n, radius=4.0, height=1.2, fovx=math.radians(60),
                       width=128, height_px=None, target=(0, 0, 0),
                       phase=0.0):
    from .data.cameras import Camera
    H = height_px or width
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / width)
    cams = []
    for i in range(n):
        a = 2 * math.pi * i / max(n, 1) + phase
        eye = (radius * math.cos(a), radius * math.sin(a), height)
        R, T = look_at_rt(eye, target)
        cams.append(Camera(uid=i, colmap_id=i + 1, R=R, T=T, fovx=fovx,
                           fovy=fovy, image_name=f"r_{i:03d}.png",
                           width=width, height=H))
    return cams


def make_gaussian_cloud(key_or_seed, n, extent=1.0, scale_range=(0.02, 0.12),
                        channels=3, sh_degree=0):
    """Random raw Gaussian parameter dict (pre-activation), numpy."""
    rng = np.random.default_rng(key_or_seed)
    xyz = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    n_sh = (sh_degree + 1) ** 2
    features = np.zeros((n, n_sh, channels), np.float32)
    features[:, 0, :] = rng.uniform(-1.5, 1.5, (n, channels))
    scales = np.log(rng.uniform(*scale_range, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)  # pre-sigmoid
    return dict(xyz=xyz, features=features, scales=scales, quats=quats,
                opacity=opacity)


def write_colmap_scene(root, n_train=6, n_points=500, width=64, height=48,
                       image_dir="images", seed=0):
    """Write a minimal-but-real COLMAP scene tree with rendered-noise PNGs."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(seed)
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    imdir = os.path.join(root, image_dir)
    os.makedirs(imdir, exist_ok=True)

    fovx = math.radians(55)
    fx = fov2focal(fovx, width)
    cams = {1: colmap.Camera(1, "PINHOLE", width, height,
                             np.array([fx, fx, width / 2, height / 2]))}
    colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))

    images = {}
    for i in range(n_train):
        a = 2 * math.pi * i / n_train
        eye = np.array([3 * math.cos(a), 3 * math.sin(a), 1.0])
        R_c2w, T = look_at_rt(eye, (0, 0, 0))
        qvec = colmap.rotmat2qvec(R_c2w.T)
        name = f"img_{i:03d}.png"
        images[i + 1] = colmap.Image(i + 1, qvec, T, 1, name,
                                     np.zeros((0, 2)),
                                     np.zeros((0,), np.int64))
        arr = (rng.random((height, width, 3)) * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(os.path.join(imdir, name))
    colmap.write_images_binary(images, os.path.join(sparse, "images.bin"))

    xyz = rng.uniform(-1, 1, (n_points, 3))
    rgb = (rng.random((n_points, 3)) * 255).astype(np.uint8)
    pts = {i: colmap.Point3D(i, xyz[i], rgb[i], 0.5,
                             np.array([1], np.int32), np.array([0], np.int32))
           for i in range(n_points)}
    colmap.write_points3D_binary(pts, os.path.join(sparse, "points3D.bin"))
    return root


def write_blender_scene(root, n_train=4, n_test=2, width=64, seed=0):
    from PIL import Image as PILImage

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    def frames(split, n):
        out = []
        for i in range(n):
            a = 2 * math.pi * i / n + (0.3 if split == "test" else 0)
            eye = np.array([3 * math.cos(a), 3 * math.sin(a), 1.5])
            R_c2w, T = look_at_rt(eye, (0, 0, 0))
            c2w = np.eye(4)
            # invert the reader's y/z flip so it round-trips
            w2c = np.eye(4)
            w2c[:3, :3] = R_c2w.T
            w2c[:3, 3] = T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            name = f"./{split}/r_{i}"
            arr = (rng.random((width, width, 4)) * 255).astype(np.uint8)
            arr[..., 3] = 255
            PILImage.fromarray(arr).save(
                os.path.join(root, f"{split}/r_{i}.png"))
            out.append({"file_path": name,
                        "transform_matrix": c2w.tolist()})
        return out

    for split, n in [("train", n_train), ("test", n_test)]:
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": math.radians(50),
                       "frames": frames(split, n)}, f)
    return root


class _NS:
    """Attribute bag for synthetic opt/pipe/args objects."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def make_dryrun_opt(**overrides):
    """Full LGDWT optimization params on tiny schedules, for mesh dryruns
    and tests that drive `Trainer` without the CLI."""
    opt = _NS(
        iterations=4, position_lr_init=0.0016, position_lr_final=0.000016,
        position_lr_delay_mult=0.01, position_lr_max_steps=30000,
        feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.01,
        rotation_lr=0.002, exposure_lr_init=0.01, exposure_lr_final=0.001,
        exposure_lr_delay_steps=0, exposure_lr_delay_mult=0.0,
        percent_dense=0.01, lambda_dssim=0.2, densification_interval=100,
        opacity_reset_interval=3000, densify_from_iter=500,
        densify_until_iter=15000, densify_grad_threshold=0.0002,
        depth_l1_weight_init=0.0, depth_l1_weight_final=0.0,
        random_background=False, optimizer_type="default",
        dwt_enable=True, dwt_ll1_weight=1.0, dwt_lh1_weight=1.0,
        dwt_hl1_weight=1.0, dwt_hh1_weight=0.0, dwt_ll2_weight=0.0,
        dwt_lh2_weight=0.0, dwt_hl2_weight=0.0, dwt_hh2_weight=0.0,
        patch_dwt_enable=True, patch_dwt_weight=0.1, patch_size=32,
        patch_percentile=0.2, patch_dwt_lh1_weight=1.0,
        patch_dwt_hl1_weight=1.0)
    opt.__dict__.update(overrides)
    return opt


def make_dryrun_pipe(**overrides):
    pipe = _NS(convert_SHs_python=False, compute_cov3D_python=False,
               debug=False, antialiasing=False, use_pallas=False,
               max_pairs=1 << 12, max_per_tile=128, tile_batch=4)
    pipe.__dict__.update(overrides)
    return pipe


def make_fake_scene(n_points=128, n_views=4, width=32, height_px=32,
                    capacity=256, sh_degree=1, seed=0):
    """An in-memory Scene stand-in (cameras + gaussians + extent) with the
    attribute surface `Trainer` needs — no files on disk."""
    from .models import gaussians as gm

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n_points, 3)).astype(np.float32)
    cols = rng.random((n_points, 3)).astype(np.float32)
    cams = make_orbit_cameras(n_views, radius=3.5, width=width,
                              height_px=height_px)
    for c in cams:
        c.image = rng.random((height_px, width, 3)).astype(np.float32)
        c.alpha_mask = np.ones((height_px, width), np.float32)

    scene = _NS(
        gaussians=gm.create_from_pcd(pts, cols, n_images=n_views,
                                     sh_degree=sh_degree, capacity=capacity),
        cameras_extent=3.5,
        model_path="/tmp/dryrun_scene",
        args=_NS(sh_degree=sh_degree, white_background=False,
                 train_test_exp=False, source_path="/tmp/dryrun_scene"),
    )
    scene.getTrainCameras = lambda scale=1.0: cams
    scene.getTestCameras = lambda scale=1.0: []
    return scene
