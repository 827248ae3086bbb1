"""Parity tests: native fastio readers vs the pure-Python paths."""

import os

import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.data import colmap, native, ply

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="fastio extension not built")


def _py_points3d(path):
    """Force the pure-Python reader."""
    import struct
    xyzs, rgbs, errs = [], [], []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            vals = struct.unpack("<QdddBBBd", f.read(8 + 24 + 3 + 8))
            xyzs.append(vals[1:4])
            rgbs.append(vals[4:7])
            errs.append(vals[7])
            (tlen,) = struct.unpack("<Q", f.read(8))
            f.seek(8 * tlen, os.SEEK_CUR)
    return (np.array(xyzs).reshape(-1, 3), np.array(rgbs, np.uint8).reshape(-1, 3),
            np.array(errs).reshape(-1, 1))


def test_points3d_parity(tmp_path):
    scene = testing.write_colmap_scene(str(tmp_path), n_train=4, n_points=77)
    path = os.path.join(scene, "sparse/0/points3D.bin")
    fx, fr, fe = native.read_points3d_binary_fast(path)
    px, pr, pe = _py_points3d(path)
    np.testing.assert_array_equal(fx, px)
    np.testing.assert_array_equal(fr, pr)
    np.testing.assert_array_equal(fe, pe)


def test_images_parity(tmp_path):
    scene = testing.write_colmap_scene(str(tmp_path), n_train=5)
    path = os.path.join(scene, "sparse/0/images.bin")
    fast = native.read_images_binary_fast(path)
    slow = colmap.read_images_binary(path, want_points2d=True)
    assert set(fast) == set(slow)
    for k in fast:
        np.testing.assert_allclose(fast[k].qvec, slow[k].qvec)
        np.testing.assert_allclose(fast[k].tvec, slow[k].tvec)
        assert fast[k].name == slow[k].name
        assert fast[k].camera_id == slow[k].camera_id


def test_ply_parity(tmp_path):
    path = str(tmp_path / "g.ply")
    rng = np.random.default_rng(0)
    props = {"x": rng.normal(size=50).astype(np.float32),
             "f_dc_0": rng.normal(size=50).astype(np.float32),
             "red": (rng.random(50) * 255).astype(np.uint8)}
    ply.write_ply(path, props)
    fast = native.read_ply_fast(path)
    for k, v in props.items():
        np.testing.assert_array_equal(fast[k], v)


def test_fastio_rejects_corrupt_counts(tmp_path):
    """Corrupt/crafted headers must raise IOError, not wrap allocations or
    abort the process (advisor finding: raw uint64 counts)."""
    fastio = pytest.importorskip("fastio")
    import struct

    bad = tmp_path / "points3D.bin"
    # a point count far beyond the file size
    bad.write_bytes(struct.pack("<Q", 1 << 60) + b"\x00" * 64)
    with pytest.raises(IOError):
        fastio.read_points3d_bin(str(bad))

    # a plausible n but a track length that wraps the seek
    rec = struct.pack("<Q", 1)  # n = 1
    rec += struct.pack("<Q", 7)                 # point id
    rec += struct.pack("<3d", 0, 0, 0)          # xyz
    rec += bytes([1, 2, 3])                     # rgb
    rec += struct.pack("<d", 0.5)               # err
    rec += struct.pack("<Q", 1 << 61)           # absurd track len
    bad2 = tmp_path / "points3D_2.bin"
    bad2.write_bytes(rec)
    with pytest.raises(IOError):
        fastio.read_points3d_bin(str(bad2))
