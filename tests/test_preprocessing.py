import os

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
