import math
import os

import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.data import colmap, ply, readers
from sparse_view_3dgs_pack_tpu.data.camera_utils import (
    camera_list_from_cam_infos, camera_to_json)


class Args:
    resolution = -1
    white_background = False
    train_test_exp = False
    data_device = "tpu"


def test_ply_roundtrip(tmp_path):
    path = str(tmp_path / "test.ply")
    props = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.arange(5, dtype=np.float32) * 2,
        "z": np.arange(5, dtype=np.float32) * 3,
        "red": np.arange(5, dtype=np.uint8),
    }
    ply.write_ply(path, props)
    back = ply.read_ply(path)
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])


def test_ply_ascii_read(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n1 2 3\n4 5 6\n")
    v = ply.read_ply(path)
    np.testing.assert_allclose(v["x"], [1, 4])
    np.testing.assert_allclose(v["z"], [3, 6])


def test_point_cloud_roundtrip(tmp_path):
    path = str(tmp_path / "pc.ply")
    xyz = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    rgb = (np.random.default_rng(1).random((10, 3)) * 255).astype(np.uint8)
    ply.store_point_cloud(path, xyz, rgb)
    pcd = ply.fetch_point_cloud(path)
    np.testing.assert_allclose(pcd.points, xyz, atol=1e-6)
    np.testing.assert_allclose(pcd.colors, rgb / 255.0, atol=1e-6)
    assert pcd.normals.shape == (10, 3)


def test_colmap_binary_roundtrip(tmp_path):
    scene = testing.write_colmap_scene(str(tmp_path), n_train=4, n_points=50)
    sparse = os.path.join(scene, "sparse/0")
    cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 4
    assert imgs[1].name == "img_000.png"
    xyz, rgb, err = colmap.read_points3D_binary(
        os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (50, 3) and rgb.dtype == np.uint8


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


def test_read_colmap_scene(tmp_path):
    scene = testing.write_colmap_scene(str(tmp_path), n_train=8, n_points=64)
    info = readers.read_colmap_scene(scene, eval=True, llffhold=4,
                                     point_cloud_type="sparse")
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 6
    assert info.point_cloud.points.shape == (64, 3)
    assert info.nerf_normalization["radius"] > 0
    # n_views subselect
    info3 = readers.read_colmap_scene(scene, eval=True, llffhold=4, n_views=3,
                                      point_cloud_type="sparse")
    assert len(info3.train_cameras) == 3
    names = [c.image_name for c in info3.train_cameras]
    assert names == sorted(names)


def test_camera_loading(tmp_path):
    scene = testing.write_colmap_scene(str(tmp_path), n_train=3)
    info = readers.read_colmap_scene(scene, point_cloud_type="sparse")
    cams = camera_list_from_cam_infos(info.train_cameras, 1.0, Args(), False,
                                      False)
    cam = cams[0]
    assert cam.image.shape == (48, 64, 3)
    assert cam.image.dtype == np.float32
    assert 0.0 <= cam.image.min() and cam.image.max() <= 1.0
    # full_proj maps a world point in front of camera into clip space
    p = np.array([0.0, 0.0, 0.0, 1.0])
    clip = cam.full_proj_transform @ p
    assert clip[3] > 0  # in front
    ndc = clip[:3] / clip[3]
    assert abs(ndc[0]) < 1 and abs(ndc[1]) < 1
    j = camera_to_json(0, info.train_cameras[0])
    assert j["width"] == 64 and "position" in j


def test_camera_center_matches_eye(tmp_path):
    import math as m
    from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras
    cams = make_orbit_cameras(4, radius=4.0, height=1.2)
    eye0 = np.array([4.0, 0.0, 1.2])
    np.testing.assert_allclose(cams[0].camera_center, eye0, atol=1e-4)
    # camera looks at origin: origin projects to image center
    clip = cams[0].full_proj_transform @ np.array([0, 0, 0, 1.0])
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)


def test_read_blender_scene(tmp_path):
    scene = testing.write_blender_scene(str(tmp_path))
    info = readers.read_nerf_synthetic_scene(scene, eval=True)
    assert len(info.train_cameras) == 4
    assert len(info.test_cameras) == 2
    assert info.is_nerf_synthetic
    assert info.point_cloud.points.shape[0] == 100_000
    # pose roundtrip: camera center should be on the orbit (radius 3, z=1.5)
    c = info.train_cameras[0]
    from sparse_view_3dgs_pack_tpu.utils.graphics import get_world2view
    center = np.linalg.inv(get_world2view(c.R, c.T))[:3, 3]
    assert math.isclose(np.linalg.norm(center[:2]), 3.0, rel_tol=1e-4)
    assert math.isclose(center[2], 1.5, rel_tol=1e-4)


def test_gaussian_ply_byte_compat(tmp_path):
    """The saved point_cloud.ply must be byte-identical in layout to the
    reference writer (`LGDWT-GS/scene/gaussian_model.py:225-256` via
    plyfile): binary_little_endian 1.0, the exact property order
    x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,rot_*, all f4, and
    row-interleaved values with features transposed (K, C) -> (C, K)."""
    import struct

    import numpy as np

    from sparse_view_3dgs_pack_tpu.models import gaussians as gm

    rng = np.random.default_rng(5)
    n, sh = 4, 2
    state = gm.create_from_pcd(rng.uniform(-1, 1, (n, 3)).astype(np.float32),
                               rng.random((n, 3)).astype(np.float32),
                               n_images=1, sh_degree=sh, capacity=8)
    # give features_rest distinguishable values to pin the transpose order
    K = (sh + 1) ** 2
    fr = np.arange(8 * (K - 1) * 3, dtype=np.float32).reshape(8, K - 1, 3)
    params = dict(state.params)
    params["features_rest"] = fr
    state = state._replace(params=params)
    path = str(tmp_path / "pc.ply")
    gm.save_ply(state, path)

    raw = open(path, "rb").read()
    header, body = raw.split(b"end_header\n", 1)
    lines = header.decode("ascii").splitlines()
    assert lines[0] == "ply"
    assert lines[1] == "format binary_little_endian 1.0"
    assert f"element vertex {n}" in lines
    want = (["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range((K - 1) * 3)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)])
    props = [ln.split()[-1] for ln in lines if ln.startswith("property")]
    types = {ln.split()[1] for ln in lines if ln.startswith("property")}
    assert props == want
    assert types == {"float"}

    ncols = len(want)
    assert len(body) == n * ncols * 4
    rows = np.frombuffer(body, "<f4").reshape(n, ncols)
    np.testing.assert_allclose(rows[:, 0:3],
                               np.asarray(state.params["xyz"][:n]))
    assert (rows[:, 3:6] == 0).all()                      # normals zero
    # features_rest stored TRANSPOSED: (K-1, C) -> channel-major (C, K-1)
    expect_rest = fr[:n].transpose(0, 2, 1).reshape(n, -1)
    np.testing.assert_allclose(rows[:, 9:9 + (K - 1) * 3], expect_rest)
    # roundtrip through the loader restores the (K-1, C) layout
    loaded = gm.load_ply(path, sh_degree=sh)
    np.testing.assert_allclose(np.asarray(loaded.params["features_rest"][:n]),
                               fr[:n], rtol=1e-6)
