"""Debug-snapshot facility (`train/debug.py`) — the TPU analogue of the
reference rasterizer's `debug` flag + `--debug_from` arming (CHECK_CUDA
snapshot_fw.dump path, `dgr_3dgs/__init__.py:17-19`,
`LGDWT-GS/train.py` debug_from)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.train import debug

from test_train_e2e import _Args, _Opt, _Pipe, _write_scene


def _state(n=32):
    rng = np.random.default_rng(0)
    return gm.create_from_pcd(rng.random((n, 3)), rng.random((n, 3)),
                              n_images=2, capacity=n, sh_degree=1)


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_debug_active_arming():
    assert not debug.debug_active(_NS(), 100)
    assert debug.debug_active(_NS(debug=True), 0)
    assert not debug.debug_active(_NS(debug_from=50), 49)
    assert debug.debug_active(_NS(debug_from=50), 50)
    assert not debug.debug_active(_NS(debug_from=-1), 10)


def test_snapshot_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "snap.npz")
    debug.dump_snapshot(path, state, {"iteration": 7, "cam_idx": 3})
    params, arrays, meta = debug.load_snapshot(path)
    assert meta["iteration"] == 7 and meta["cam_idx"] == 3
    for k, v in state.params.items():
        np.testing.assert_array_equal(params[k], np.asarray(v))
    np.testing.assert_array_equal(arrays["alive"], np.asarray(state.alive))


def test_check_step_dumps_on_nonfinite(tmp_path):
    state = _state()
    # off: a NaN loss passes through silently (no host validation)
    debug.check_step(_NS(), 5, {"loss": jnp.float32(np.nan)}, state,
                     str(tmp_path))
    # armed + finite: no-op
    debug.check_step(_NS(debug=True), 5, {"loss": jnp.float32(0.5)}, state,
                     str(tmp_path))
    assert not os.path.exists(tmp_path / "snapshot_fw.npz")
    # armed + NaN: snapshot written, loud abort
    with pytest.raises(RuntimeError, match="snapshot_fw.npz"):
        debug.check_step(_NS(debug=True), 5,
                         {"loss": jnp.float32(np.nan)}, state,
                         str(tmp_path), {"cam_idx": 1})
    params, _, meta = debug.load_snapshot(str(tmp_path / "snapshot_fw.npz"))
    assert meta["iteration"] == 5 and meta["cam_idx"] == 1
    assert set(params) == set(state.params)


def test_trainer_step_snapshots_nan(tmp_path):
    """End-to-end through Trainer.step: poisoned params -> non-finite loss
    -> RuntimeError + replayable snapshot in the model dir."""
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    scene_dir = _write_scene(str(tmp_path / "scene"))
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "model")
    os.makedirs(args.model_path, exist_ok=True)
    pipe = _Pipe()
    pipe.debug = True
    scene = Scene(args, sh_degree=args.sh_degree)
    trainer = Trainer(scene, _Opt(), pipe, args, method="3dgs", quiet=True)
    # poison the colors: a NaN POSITION is deliberately survivable (the
    # projection's NaN-radius cull drops it), but a NaN SH coefficient on a
    # visible gaussian reaches the blend and the loss
    trainer.state = trainer.state._replace(params={
        **trainer.state.params,
        "features_dc": jnp.full_like(trainer.state.params["features_dc"],
                                     jnp.nan)})
    with pytest.raises(RuntimeError, match="non-finite loss"):
        trainer.step()
    snap = os.path.join(args.model_path, "snapshot_fw.npz")
    params, _, meta = debug.load_snapshot(snap)
    assert meta["iteration"] == 1
    assert np.isnan(params["features_dc"]).any()   # poisoned input replayable
