"""Scene orchestration (reference `scene/__init__.py:21-152`).

Detects COLMAP vs Blender layouts, loads cameras at requested resolution
scales, initialises the GaussianState from the scene point cloud, and owns
model-dir artefacts: `point_cloud/iteration_N/point_cloud.ply`,
`exposure.json`, `input.ply`, `cameras.json`, `cfg_args`.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Optional

import numpy as np

from .config import GroupParams
from .data import readers
from .data.camera_utils import camera_list_from_cam_infos, camera_to_json
from .models import gaussians as gm
from .utils.general import searchForMaxIteration


class Scene:
    def __init__(self, args: GroupParams, load_iteration: Optional[int] = None,
                 shuffle: bool = True, resolution_scales=(1.0,),
                 sh_degree: int = 3, channels: int = 3,
                 use_nir: bool = False):
        self.model_path = args.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = searchForMaxIteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        if os.path.exists(os.path.join(args.source_path, "sparse")):
            scene_info = readers.read_colmap_scene(
                args.source_path, args.images, getattr(args, "depths", ""),
                args.eval, getattr(args, "train_test_exp", False),
                n_views=getattr(args, "n_views", 0),
                point_cloud_type=getattr(args, "point_cloud_type", "dense"))
        elif os.path.exists(os.path.join(args.source_path,
                                         "transforms_train.json")):
            print("Found transforms_train.json, assuming Blender data set!")
            scene_info = readers.read_nerf_synthetic_scene(
                args.source_path, args.white_background,
                getattr(args, "depths", ""), args.eval,
                n_views=getattr(args, "n_views", 0))
        else:
            raise ValueError(f"Could not recognize scene type: "
                             f"{args.source_path}")
        self.scene_info = scene_info

        if not self.loaded_iter:
            if scene_info.ply_path and os.path.exists(scene_info.ply_path):
                shutil.copyfile(scene_info.ply_path,
                                os.path.join(self.model_path, "input.ply"))
            cam_json = [camera_to_json(i, c) for i, c in enumerate(
                scene_info.train_cameras + scene_info.test_cameras)]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]

        self.train_cameras = {}
        self.test_cameras = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = camera_list_from_cam_infos(
                scene_info.train_cameras, scale, args,
                scene_info.is_nerf_synthetic, False)
            self.test_cameras[scale] = camera_list_from_cam_infos(
                scene_info.test_cameras, scale, args,
                scene_info.is_nerf_synthetic, True)

        n_train = len(self.train_cameras[resolution_scales[0]])
        if self.loaded_iter:
            self.gaussians = gm.load_ply(os.path.join(
                self.model_path, "point_cloud",
                f"iteration_{self.loaded_iter}", "point_cloud.ply"),
                sh_degree=sh_degree, n_images=max(n_train, 1))
            exp_path = os.path.join(self.model_path, "exposure.json")
            if os.path.exists(exp_path):
                import jax.numpy as jnp
                with open(exp_path) as f:
                    exp = json.load(f)
                names = [c.image_name for c in
                         self.train_cameras[resolution_scales[0]]]
                mats = [exp.get(n, np.eye(3, 4).tolist()) for n in names]
                if mats:
                    self.gaussians = self.gaussians._replace(
                        exposure=jnp.asarray(np.array(mats, np.float32)))
        else:
            pcd = scene_info.point_cloud
            if pcd is None:
                raise ValueError("no point cloud available for init")
            self.gaussians = gm.create_from_pcd(
                pcd.points.astype(np.float32), pcd.colors.astype(np.float32),
                n_images=max(n_train, 1), sh_degree=sh_degree,
                channels=channels, use_nir=use_nir)

    def save(self, iteration: int) -> None:
        pc_path = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{iteration}")
        gm.save_ply(self.gaussians, os.path.join(pc_path, "point_cloud.ply"))
        names = [c.image_name for c in self.getTrainCameras()]
        gm.save_exposure_json(self.gaussians, names,
                              os.path.join(self.model_path, "exposure.json"))

    def getTrainCameras(self, scale=1.0):
        return self.train_cameras[scale]

    def getTestCameras(self, scale=1.0):
        return self.test_cameras[scale]
