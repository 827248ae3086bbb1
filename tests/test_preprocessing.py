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
