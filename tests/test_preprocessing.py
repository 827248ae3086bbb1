import os
import json

import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing


def test_llff_poses(tmp_path):
    from sparse_view_3dgs_pack_tpu.preprocessing.llff_poses import gen_poses

    scene = testing.write_colmap_scene(str(tmp_path), n_train=6,
                                       n_points=100)
    assert gen_poses(scene)
    pb = np.load(os.path.join(scene, "poses_bounds.npy"))
    assert pb.shape == (6, 17)
    poses = pb[:, :15].reshape(-1, 3, 5)
    # rotation block orthonormal
    R = poses[0, :, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # hwf column
    assert poses[0, 0, 4] == 48 and poses[0, 1, 4] == 64
    # bounds positive and ordered
    assert (pb[:, 15] <= pb[:, 16]).all()
    assert (pb[:, 15] > 0).all()


def test_greenhouse_pipeline(tmp_path):
    from PIL import Image as PILImage

    from sparse_view_3dgs_pack_tpu.preprocessing.greenhouse import \
        process_scene

    scene = str(tmp_path / "scene")
    cam1 = os.path.join(scene, "TIFF", "Camera1")
    os.makedirs(cam1, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((16, 20, 4)) * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(os.path.join(cam1, f"img_{i}.tif"))

    process_scene(scene, "scene")
    rgb_dir = os.path.join(scene, "scene_rgb")
    assert len(os.listdir(rgb_dir)) == 2
    for band in ("R", "G", "RE", "NIR"):
        d = os.path.join(scene, f"images_{band}")
        assert len(os.listdir(d)) == 2
    assert os.path.isdir(os.path.join(scene, "nir"))
    with PILImage.open(os.path.join(rgb_dir,
                                    sorted(os.listdir(rgb_dir))[0])) as im:
        assert im.size == (20, 16)


def test_fewshot_requires_colmap(tmp_path):
    # without a COLMAP binary the pipeline must fail loudly, not silently
    import shutil
    if shutil.which("colmap"):
        pytest.skip("colmap available; behavior covered by real runs")
    from sparse_view_3dgs_pack_tpu.preprocessing.fewshot_colmap import \
        run_fewshot_pipeline

    scene = testing.write_colmap_scene(str(tmp_path), n_train=6)
    with pytest.raises(Exception):
        run_fewshot_pipeline(scene, 3)


def test_convert_cli_flags():
    import convert
    with pytest.raises(SystemExit):
        convert.main(["--help"])


def test_full_eval_builds_expected_jobs(monkeypatch, tmp_path):
    """full_eval drives train/render/metrics per scene with the reference's
    per-set resolution flags (gaussian-splatting/full_eval.py: images_4 for
    m360 outdoor, images_2 indoor, none for tat/db)."""
    import full_eval

    calls = []
    monkeypatch.setattr(full_eval, "run", lambda cmd: calls.append(cmd))
    full_eval.main(["-m360", str(tmp_path / "m360"),
                    "-tat", str(tmp_path / "tat"),
                    "--output_path", str(tmp_path / "out"),
                    "--method", "3dgs"])

    trains = [c for c in calls if any(a.endswith("train.py") for a in c)]
    renders = [c for c in calls if any(a.endswith("render.py") for a in c)]
    metrics = [c for c in calls if any(a.endswith("metrics.py") for a in c)]
    assert len(trains) == len(renders) == 9 + 2   # 9 m360 + 2 tat scenes
    assert len(metrics) == 1 and len(metrics[0]) >= 2 + 11

    def flags(scene):
        cmd = next(c for c in trains if any(scene in a for a in c))
        return cmd[cmd.index("-i") + 1] if "-i" in cmd else None

    assert flags("bicycle") == "images_4"        # outdoor
    assert flags("bonsai") == "images_2"         # indoor
    assert flags("truck") is None                # tanks&temples: full res
    assert all("--method" in c and "3dgs" in c for c in trains)

    # skip flags suppress their stages
    calls.clear()
    full_eval.main(["-tat", str(tmp_path / "tat"), "--skip_training",
                    "--skip_metrics", "--output_path", str(tmp_path / "o2")])
    assert all(any(a.endswith("render.py") for a in c) for c in calls)


def test_make_depth_scale_recovers_affine(tmp_path):
    """End-to-end `make_depth_scale`: COLMAP binaries + a 16-bit mono
    inverse-depth PNG related to true inverse depth by a known affine map
    must yield depth_params.json with that scale/offset (reference
    `utils/make_depth_scale.py:8-50` least-squares contract)."""
    import cv2

    from sparse_view_3dgs_pack_tpu.data import colmap
    from sparse_view_3dgs_pack_tpu.preprocessing.make_depth_scale import \
        make_depth_scale

    rng = np.random.default_rng(5)
    W, H, fx = 64, 48, 70.0
    n = 60
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)

    cams = {1: colmap.Camera(1, "PINHOLE", W, H,
                             np.array([fx, fx, W / 2, H / 2]))}
    colmap.write_cameras_binary(cams, str(sparse / "cameras.bin"))

    # camera at origin looking +z (identity rotation); points in frustum
    z = rng.uniform(2.0, 5.0, n)
    u = rng.uniform(6, W - 6, n)
    v = rng.uniform(6, H - 6, n)
    x = (u - W / 2) * z / fx
    y = (v - H / 2) * z / fx
    xyz = np.stack([x, y, z], axis=1)
    pids = np.arange(1, n + 1, dtype=np.int64)
    images = {1: colmap.Image(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                              "view.png", np.stack([u, v], axis=1), pids)}
    colmap.write_images_binary(images, str(sparse / "images.bin"))
    pts = {int(pid): colmap.Point3D(int(pid), xyz[i], np.zeros(3, np.uint8),
                                    0.1, np.array([1], np.int32),
                                    np.array([i], np.int32))
           for i, pid in enumerate(pids)}
    colmap.write_points3D_binary(pts, str(sparse / "points3D.bin"))

    # mono = (1/z - offset)/scale  =>  mono*scale + offset == 1/z
    scale, offset = 0.5, 0.05
    mono = np.zeros((H, W), np.float32)
    mono[np.round(v).astype(int), np.round(u).astype(int)] = \
        (1.0 / z - offset) / scale
    (tmp_path / "depths").mkdir()
    cv2.imwrite(str(tmp_path / "depths" / "view.png"),
                (mono * (2 ** 16)).astype(np.uint16))

    out = make_depth_scale(str(tmp_path), "depths")
    got = json.load(open(out))["view"]
    assert abs(got["scale"] - scale) < 5e-3
    assert abs(got["offset"] - offset) < 5e-3


def test_data_pipeline_stage_routing(monkeypatch, tmp_path):
    """--stage routes to the right pipeline pieces with dataset-aware
    feature caps (reference `data_pipeline.py:26-35,47`)."""
    from sparse_view_3dgs_pack_tpu.preprocessing import data_pipeline as dp

    calls = []
    monkeypatch.setattr(dp, "run_full_colmap",
                        lambda *a, **k: calls.append(("full", a)))
    monkeypatch.setattr(dp, "gen_poses",
                        lambda *a, **k: calls.append(("poses", a)))
    monkeypatch.setattr(dp, "run_fewshot_pipeline",
                        lambda *a, **k: calls.append(("fewshot", a)))

    (tmp_path / "scn").mkdir()
    base = ["--base_path", str(tmp_path), "--scene", "scn"]

    dp.main(base + ["--stage", "part1"])
    assert [c[0] for c in calls] == ["full", "poses"]

    # part2 without --n_views must fail loudly
    calls.clear()
    with pytest.raises(SystemExit):
        dp.main(base + ["--stage", "part2"])

    dp.main(base + ["--stage", "part2", "--n_views", "3",
                    "--dataset", "mipnerf360"])
    assert calls == [("fewshot", (str(tmp_path / "scn"), 3, "colmap",
                                  16384, "mipnerf360", 1))]
    calls.clear()
    dp.main(base + ["--stage", "part2", "--n_views", "3",
                    "--dataset", "llff"])
    assert calls[0][1][3] == 32768   # llff feature cap

    # part1 outputs present -> full reconstruction skipped, not re-run
    calls.clear()
    (tmp_path / "scn" / "images").mkdir()
    (tmp_path / "scn" / "sparse" / "0").mkdir(parents=True)
    (tmp_path / "scn" / "poses_bounds.npy").write_bytes(b"")
    dp.main(base + ["--stage", "full", "--n_views", "4"])
    assert [c[0] for c in calls] == ["fewshot"]
