import os

import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.depth.estimator import (NoDepth,
                                                       PrecomputedDepth,
                                                       get_depth_estimator)


def test_precomputed_estimator(tmp_path):
    cams = testing.make_orbit_cameras(2, width=32, height_px=24)
    ddir = tmp_path / "depth_maps"
    ddir.mkdir()
    d = np.random.default_rng(0).random((24, 32)).astype(np.float32)
    np.save(ddir / "r_000.npy", d)

    est = PrecomputedDepth(str(ddir))
    got = est.depth_for_camera(cams[0])
    np.testing.assert_allclose(got, d)
    assert est.depth_for_camera(cams[1]) is None   # missing file
    assert est.estimate(np.zeros((24, 32, 3))) is None


def test_precomputed_resizes(tmp_path):
    cams = testing.make_orbit_cameras(1, width=64, height_px=48)
    ddir = tmp_path / "depth_maps"
    ddir.mkdir()
    np.save(ddir / "r_000.npy",
            np.random.default_rng(0).random((24, 32)).astype(np.float32))
    est = PrecomputedDepth(str(ddir))
    got = est.depth_for_camera(cams[0])
    assert got.shape == (48, 64)


def test_auto_selection(tmp_path):
    # no depth_maps dir, no hub cache → NoDepth
    est = get_depth_estimator("auto", str(tmp_path))
    assert isinstance(est, NoDepth)
    assert not est.available
    # with depth_maps dir → precomputed
    (tmp_path / "depth_maps").mkdir()
    est2 = get_depth_estimator("auto", str(tmp_path))
    assert isinstance(est2, PrecomputedDepth)


def test_none_kind(tmp_path):
    est = get_depth_estimator("none", str(tmp_path))
    assert isinstance(est, NoDepth)
