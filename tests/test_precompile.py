"""Speculative background compilation (`train/precompile.py`) + on-device
eval metrics: the growth edges (2x capacity, 2x/half pair bucket) must be
submitted with avals that exactly match what the foreground will compile
after the corresponding growth, and `Trainer.evaluate` must reduce to
(psnr, l1) on device (the round-3 30k TPU run measured 57-160 s per eval
from full-image host round-trips, and ~1.0 ks of growth-recompile stalls)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.train.optim import init_adam
from sparse_view_3dgs_pack_tpu.train.precompile import (SpeculativeCompiler,
                                                        grown_specs,
                                                        specs_of,
                                                        speculation_enabled)

from test_train_e2e import _Args, _Opt, _Pipe, _write_scene


# ------------------------------------------------------------------ unit

def test_compiler_dedup_and_error_swallow():
    c = SpeculativeCompiler(enabled=True, quiet=True)
    ran = []
    assert c.submit("a", lambda: ran.append(1))
    assert not c.submit("a", lambda: ran.append(2))   # dedup

    def boom():
        raise RuntimeError("speculative failures must never propagate")

    assert c.submit("b", boom)
    c.wait_idle()
    assert ran == [1]
    assert "a" in c.compiled and "b" in c.failed


def test_compiler_disabled_and_mark_known():
    off = SpeculativeCompiler(enabled=False)
    assert not off.submit("a", lambda: None)
    on = SpeculativeCompiler(enabled=True, quiet=True)
    on.mark_known("k")
    assert not on.submit("k", lambda: None)


def test_speculation_env_override(monkeypatch):
    monkeypatch.setenv("GS_SPECULATIVE_COMPILE", "0")
    assert not speculation_enabled()
    monkeypatch.setenv("GS_SPECULATIVE_COMPILE", "1")
    assert speculation_enabled()
    monkeypatch.delenv("GS_SPECULATIVE_COMPILE")
    # CPU backend in tests → default off (no persistent cache there)
    assert not speculation_enabled()


def test_grown_specs_match_real_growth():
    rng = np.random.default_rng(0)
    state = gm.create_from_pcd(rng.uniform(-1, 1, (100, 3)).astype(np.float32),
                               rng.random((100, 3)).astype(np.float32),
                               n_images=4, sh_degree=2, capacity=256)
    adam = init_adam(state.params)
    s2, a2 = grown_specs(state, adam, 512)

    from sparse_view_3dgs_pack_tpu.train import capacity as cap_mod
    real_s, real_a = cap_mod.grow_state(state, adam, quiet=True)
    for spec, real in zip(jax.tree.leaves((s2, a2)),
                          jax.tree.leaves((real_s, real_a))):
        assert spec.shape == real.shape and spec.dtype == real.dtype


# ------------------------------------------------------------ integration

@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return _write_scene(str(tmp_path_factory.mktemp("precomp_scene")))


@pytest.fixture(scope="module")
def trainer(scene_dir, tmp_path_factory):
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path_factory.mktemp("precomp_model"))
    scene = Scene(args, sh_degree=args.sh_degree)
    return Trainer(scene, _Opt(), _Pipe(), args, method="lgdwt", quiet=True)


def _lrs_bg(tr):
    lrs = {k: jnp.asarray(f(1), jnp.float32) for k, f in tr.lr_scheds.items()
           if k in tr.state.params}
    return lrs, tr.background


class _LowerRecorder:
    """Stands in for the jitted train_step: records lower() avals."""

    def __init__(self):
        self.calls = []

    def lower(self, *args, **kwargs):
        self.calls.append(args)
        return self

    def compile(self):
        return None


def test_trainer_submits_growth_edges(trainer, monkeypatch):
    """`_precompile_next` must submit the 2x-capacity edge (with grown state
    avals), the 2x-pair-bucket edge (same state avals, doubled bucket), and
    warm the densify/eval graphs for every shape INCLUDING the current."""
    from sparse_view_3dgs_pack_tpu.train import loop as loop_mod
    rec = _LowerRecorder()
    dens = _LowerRecorder()
    evalr = _LowerRecorder()
    monkeypatch.setattr(loop_mod, "train_step", rec)
    monkeypatch.setattr(loop_mod, "densify_and_prune", dens)
    monkeypatch.setattr(loop_mod, "_eval_view_metrics", evalr)
    trainer.precompiler = SpeculativeCompiler(enabled=True, quiet=True)

    lrs, bg = _lrs_bg(trainer)
    trainer._precompile_next(lrs, bg)
    trainer.precompiler.wait_idle()
    assert not trainer.precompiler.failed

    cap = trainer.state.capacity
    mp = trainer._raster_cfg.max_pairs
    seen = []
    for args in rec.calls:
        s_spec, cfg = args[0], args[-1]
        seen.append((jax.tree.leaves(s_spec)[0].shape[0],
                     cfg.raster.max_pairs))
    assert (cap * 2, trainer._config_for(cap * 2).raster.max_pairs) in seen
    assert (cap, mp * 2) in seen
    # the CURRENT shape's train step is never speculated (the foreground
    # just built it) — but its densify/eval graphs ARE warmed
    assert (cap, mp) not in seen
    dens_caps = {jax.tree.leaves(args[0])[0].shape[0]
                 for args in dens.calls}
    assert cap in dens_caps and cap * 2 in dens_caps
    eval_caps = {jax.tree.leaves(args[0])[0].shape[0]
                 for args in evalr.calls}
    assert cap in eval_caps and cap * 2 in eval_caps


def test_trainer_step_triggers_speculation_once(trainer, monkeypatch):
    """The step() hook fires exactly once per shape change (dirty flag)."""
    from sparse_view_3dgs_pack_tpu.train import loop as loop_mod
    calls = []
    monkeypatch.setattr(
        trainer, "_precompile_next", lambda lrs, bg: calls.append(1))
    trainer._shapes_dirty = True
    trainer.step()
    trainer.step()
    assert len(calls) == 1
    trainer._rebuild_config()          # a growth re-arms it
    trainer.step()
    assert len(calls) == 2


@pytest.mark.timeout(900)
def test_grown_specs_lower_and_compile(trainer):
    """The real train_step must lower+compile from the speculative avals —
    this is exactly the background thunk's body (one CPU compile)."""
    from sparse_view_3dgs_pack_tpu.train.step import train_step
    cap2 = trainer.state.capacity * 2
    s2, a2 = grown_specs(trainer.state, trainer.adam, cap2)
    lrs, bg = _lrs_bg(trainer)
    others = specs_of((trainer.exp_adam, trainer.carry, trainer.bank,
                       jnp.asarray(0, jnp.int32), lrs,
                       jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(0, jnp.int32), bg))
    cfg2 = trainer._config_for(cap2)
    assert train_step.lower(s2, a2, *others, cfg2).compile() is not None

    # the aux graphs (densify + eval) must lower from the same avals —
    # run the REAL _precompile_next with a forced-on compiler and assert
    # every background thunk compiled (a failure means the speculative
    # avals drifted from the foreground's)
    trainer.precompiler = SpeculativeCompiler(enabled=True, quiet=True)
    trainer._precompile_next(lrs, bg)
    trainer.precompiler.wait_idle(600)
    assert trainer.precompiler.compiled
    assert not trainer.precompiler.failed


def test_evaluate_matches_host_metrics(trainer):
    """On-device (psnr, l1) must equal the previous host-side computation."""
    from sparse_view_3dgs_pack_tpu.renderer import render
    cams = trainer.scene.getTrainCameras()[:2]
    stats = trainer.evaluate(cams)
    assert stats["n_views"] == 2

    ps, ls = [], []
    for cam in cams:
        res = render(trainer.state, cam, trainer.background,
                     sh_degree_active=trainer.active_sh_degree,
                     config=trainer._raster_cfg)
        img = np.asarray(res.render)
        gt = cam.image[..., :3]
        mse = max(float(np.mean((img - gt) ** 2)), 1e-12)
        ps.append(20.0 * np.log10(1.0 / np.sqrt(mse)))
        ls.append(float(np.abs(img - gt).mean()))
    assert abs(stats["psnr"] - np.mean(ps)) < 1e-3
    assert abs(stats["l1"] - np.mean(ls)) < 1e-5
    # GT uploads are cached per camera
    assert len(trainer._eval_gt_cache) == 2
    trainer.evaluate(cams)
    assert len(trainer._eval_gt_cache) == 2


# --------------------------------------------- all four loops speculate

class _SyncFirstEdge:
    """Recording compiler: runs the FIRST edge's thunk synchronously (so a
    malformed lower() raises in the test), records the rest."""

    instances = []
    real_cls = SpeculativeCompiler        # bound before any monkeypatch

    def __init__(self, *a, **k):
        self._real = _SyncFirstEdge.real_cls(enabled=True, quiet=True)
        self.enabled = True
        self.compiled = []
        _SyncFirstEdge.instances.append(self)

    def mark_known(self, key):
        self._real.mark_known(key)

    def submit(self, key, thunk, label=None):
        if key in self._real._seen:
            return False
        self._real._seen.add(key)
        if not self.compiled:
            thunk()                      # raise = test failure
        self.compiled.append(key)
        return True


@pytest.fixture()
def sync_compiler(monkeypatch):
    from sparse_view_3dgs_pack_tpu.train import precompile as pc_mod
    _SyncFirstEdge.instances = []
    monkeypatch.setattr(pc_mod, "SpeculativeCompiler", _SyncFirstEdge)
    return _SyncFirstEdge


def _loop_args(scene_dir, tmp_path, name):
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / name)
    args.save_iterations = []
    args.test_iterations = []
    args.depth_estimator = "none"
    os.makedirs(args.model_path, exist_ok=True)
    opt = _Opt()
    opt.iterations = 2
    opt.densify_from_iter = 100       # no densify events in 2 iters
    return args, opt


@pytest.mark.timeout(1200)
def test_fsgs_loop_speculates(scene_dir, tmp_path, sync_compiler):
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import train_fsgs
    args, opt = _loop_args(scene_dir, tmp_path, "fsgs")
    opt.depth_weight = 0.0
    opt.depth_pseudo_weight = 0.0
    opt.sample_pseudo_interval = 1000
    opt.start_sample_pseudo = 1000
    opt.end_sample_pseudo = 1001
    opt.proximity_until_iter = 0
    opt.dist_thres = 10.0
    train_fsgs(args, opt, _Pipe(), args)
    assert sync_compiler.instances
    keys = sync_compiler.instances[0].compiled
    assert len(keys) >= 2             # 2x-capacity and pair-bucket edges


@pytest.mark.timeout(1200)
def test_dng_loop_speculates(scene_dir, tmp_path, sync_compiler):
    from sparse_view_3dgs_pack_tpu.train.dng_loop import train_dngaussian
    args, opt = _loop_args(scene_dir, tmp_path, "dng")
    opt.error_tolerance = 0.1
    opt.shape_pena = 0.0
    opt.scale_pena = 0.0
    opt.opa_pena = 0.0
    opt.soft_depth_start = 1000
    opt.hard_depth_start = 1000
    opt.prune_threshold = 0.005
    opt.use_neural = 1
    train_dngaussian(args, opt, _Pipe(), args)
    assert sync_compiler.instances
    assert len(sync_compiler.instances[0].compiled) >= 2


@pytest.mark.timeout(1200)
def test_nir_loop_speculates(scene_dir, tmp_path, sync_compiler):
    from sparse_view_3dgs_pack_tpu.train.nir_loop import train_nir
    args, opt = _loop_args(scene_dir, tmp_path, "nir")
    train_nir(args, opt, _Pipe(), args)
    assert sync_compiler.instances
    assert len(sync_compiler.instances[0].compiled) >= 2
