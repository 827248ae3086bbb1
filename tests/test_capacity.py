"""Capacity + pair-bucket management (`train/capacity.py`) — the shared
grow/warn semantics every loop must have (reference: exact reallocation per
densify event, `LGDWT-GS/scene/gaussian_model.py:316-407`, never drops).
Includes loop-level tests that force append-drop at a tiny capacity in each
of the four training loops and assert growth plus a loud warning."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.train import capacity
from sparse_view_3dgs_pack_tpu.train.densify import DensifyResult
from sparse_view_3dgs_pack_tpu.train.optim import init_adam

from test_train_e2e import _Args, _Opt, _Pipe, _write_scene

W = H = 64


# ------------------------------------------------------------------ unit

def test_pair_bucket_grows_with_headroom():
    b = capacity.PairBucket(1 << 10, quiet=True)
    new = b.update(2000)                      # overflow
    assert new is not None and new >= 2000 * 1.3
    assert (new & (new - 1)) == 0             # power of two
    assert b.update(new) is None              # fits now


def test_pair_bucket_hard_cap_warns(capsys):
    b = capacity.PairBucket(1 << 20, hard_cap=1 << 21, quiet=True)
    new = b.update(10_000_000)
    assert new == 1 << 21
    assert "bucket cap" in capsys.readouterr().out
    # persistent over-cap demand: no further change, no re-jit churn
    assert b.update(10_000_000) is None


def test_pair_bucket_shrinks_after_streak():
    b = capacity.PairBucket(1 << 18, quiet=True)
    for _ in range(capacity.PAIR_SHRINK_STREAK - 1):
        assert b.update(100) is None
    assert b.update(100) == (1 << 17)
    # a mid-zone sample resets the streak
    for _ in range(capacity.PAIR_SHRINK_STREAK - 1):
        b.update(100)
    assert b.update((1 << 17) // 2) is None   # not oversized 3x → reset
    assert b.update(100) is None              # streak restarted


def test_lagged_scalar_one_step_delay():
    lag = capacity.LaggedScalar()
    assert lag.swap(jnp.asarray(10)) is None     # nothing pending yet
    assert lag.swap(20) == 10                    # previous step's value
    assert lag.swap(30) == 20
    assert lag.flush() == 30                     # drains without replacing
    assert lag.flush() is None


def test_pair_overflow_grows_on_the_next_step():
    """A mid-interval pair jump (camera change between densify events) must
    grow the bucket at the very next step — the round-3 every-10 sampling
    left up to 9 iterations of silently dropped tail pairs (VERDICT r3)."""
    bucket = capacity.PairBucket(1 << 10, quiet=True)
    lag = capacity.LaggedScalar()
    demands = [100, 100, 100, 5000, 5000, 5000]   # jump at step 3
    grew_at = None
    for step, n in enumerate(demands):
        prev = lag.swap(jnp.asarray(n))           # loop-identical wiring
        if prev is not None and bucket.update(prev) is not None:
            grew_at = step
            break
    assert grew_at == 4                           # one step after the jump
    assert bucket.max_pairs >= 5000


def _tiny_state(capacity_=256, n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    return gm.create_from_pcd(pts, cols, n_images=8, sh_degree=2,
                              capacity=capacity_)


def test_ensure_headroom_grows_and_pads_adam():
    state = _tiny_state(capacity_=256, n=230)   # 230 > 0.85*256
    adam = init_adam(state.params)
    adam = adam._replace(m={k: v + 1.0 for k, v in adam.m.items()})
    state2, adam2, grew = capacity.ensure_headroom(state, adam, quiet=True)
    assert grew and state2.capacity == 512
    for k in state.params:
        assert adam2.m[k].shape == state2.params[k].shape
        # old moments survive, new slots zeroed
        np.testing.assert_array_equal(np.asarray(adam2.m[k][:256]),
                                      np.asarray(adam.m[k]))
        assert float(jnp.abs(adam2.m[k][256:]).max()) == 0.0
    # plenty of headroom → no-op
    _, _, grew2 = capacity.ensure_headroom(state2, adam2, quiet=True)
    assert not grew2


def test_dropped_appends_warns(capsys):
    res = DensifyResult(state=None, opt_state=None,
                        requested=jnp.asarray(10, jnp.int32),
                        appended=jnp.asarray(4, jnp.int32),
                        pruned=jnp.asarray(0, jnp.int32))
    assert capacity.dropped_appends(res, 100, 256)
    out = capsys.readouterr().out
    assert "WARNING" in out and "6 of 10" in out
    ok = res._replace(appended=jnp.asarray(10, jnp.int32))
    assert not capacity.dropped_appends(ok, 100, 256)


# ------------------------------------------------------- loop integration

@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return _write_scene(str(tmp_path_factory.mktemp("cap_scene")))


def _small_cap(monkeypatch, cap=256):
    """Force Scene's create_from_pcd to produce a tiny capacity so a few
    aggressive densify events overflow it."""
    monkeypatch.setattr(gm, "_next_capacity",
                        lambda n, minimum=cap: cap)


def _aggressive(opt, iterations=5):
    """Densify threshold ~0 → the very first event (iter 5) doubles the
    point count, overflows the tiny capacity, and must trigger growth.
    iterations=5 by default: ending right at the event means the grown
    capacity's train step never needs to compile — these full-loop tests
    cost ONE step compile each, not two (no persistent compile cache; see
    conftest.py)."""
    opt.densify_grad_threshold = 1e-8
    opt.densification_interval = 5
    opt.densify_from_iter = 2
    opt.densify_until_iter = 40
    opt.iterations = iterations
    return opt


def test_trainer_append_drop_grows(scene_dir, tmp_path, monkeypatch,
                                   capsys):
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    _small_cap(monkeypatch)
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "m")
    os.makedirs(args.model_path, exist_ok=True)
    scene = Scene(args, sh_degree=args.sh_degree)
    assert scene.gaussians.capacity == 256
    trainer = Trainer(scene, _aggressive(_Opt(), iterations=8), _Pipe(),
                      args,
                      method="3dgs", quiet=False)
    for _ in range(8):     # event at iter 5, then 3 post-growth steps
        trainer.step()
    assert trainer.state.capacity > 256
    assert "[capacity] grown" in capsys.readouterr().out


def test_trainer_pair_bucket_grows(scene_dir, tmp_path, monkeypatch,
                                   capsys):
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "m")
    os.makedirs(args.model_path, exist_ok=True)
    pipe = _Pipe()
    pipe.max_pairs = 512            # far below real demand at 64x64
    scene = Scene(args, sh_degree=args.sh_degree)
    trainer = Trainer(scene, _Opt(), pipe, args, method="3dgs", quiet=False)
    # per-iteration lagged check: step 1 overflows, step 2's check sees it
    for _ in range(2):
        trainer.step()
    assert trainer.pair_bucket.max_pairs > 512
    assert "pair bucket grown" in capsys.readouterr().out


@pytest.mark.timeout(1200)
def test_fsgs_loop_append_drop_grows(scene_dir, tmp_path, monkeypatch,
                                     capsys):
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import train_fsgs

    _small_cap(monkeypatch)
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "fsgs")
    args.save_iterations = []
    args.depth_estimator = "none"
    os.makedirs(args.model_path, exist_ok=True)
    opt = _aggressive(_Opt())
    opt.depth_weight = 0.0
    opt.depth_pseudo_weight = 0.0
    opt.sample_pseudo_interval = 1000
    opt.start_sample_pseudo = 1000
    opt.end_sample_pseudo = 1001
    opt.proximity_until_iter = 40
    opt.dist_thres = 10.0
    scene = train_fsgs(args, opt, _Pipe(), args)
    assert scene.gaussians.capacity > 256
    assert "[capacity] grown" in capsys.readouterr().out


@pytest.mark.timeout(1200)
def test_dng_loop_append_drop_grows(scene_dir, tmp_path, monkeypatch,
                                    capsys):
    from sparse_view_3dgs_pack_tpu.train.dng_loop import train_dngaussian

    _small_cap(monkeypatch)
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "dng")
    args.save_iterations = []
    args.depth_estimator = "none"
    os.makedirs(args.model_path, exist_ok=True)
    opt = _aggressive(_Opt())
    opt.error_tolerance = 0.1
    opt.shape_pena = 0.0
    opt.scale_pena = 0.0
    opt.opa_pena = 0.0
    opt.soft_depth_start = 1000
    opt.hard_depth_start = 1000
    opt.prune_threshold = 0.005
    opt.use_neural = 1
    scene = train_dngaussian(args, opt, _Pipe(), args)
    assert scene.gaussians.capacity > 256
    assert "[capacity] grown" in capsys.readouterr().out


@pytest.mark.timeout(1200)
def test_nir_loop_append_drop_grows(scene_dir, tmp_path, monkeypatch,
                                    capsys):
    from sparse_view_3dgs_pack_tpu.train.nir_loop import train_nir

    # NIR ground truth: sibling nir/ dir with per-view PNGs
    from PIL import Image as PILImage
    ndir = os.path.join(scene_dir, "nir")
    os.makedirs(ndir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = (rng.random((H, W)) * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(os.path.join(ndir, f"r_{i}.png"))

    _small_cap(monkeypatch)
    args = _Args()
    args.source_path = scene_dir
    args.model_path = str(tmp_path / "nir")
    args.save_iterations = []
    args.nir_weight = 0.5
    os.makedirs(args.model_path, exist_ok=True)
    opt = _aggressive(_Opt())
    scene = train_nir(args, opt, _Pipe(), args)
    assert scene.gaussians.capacity > 256
    assert "[capacity] grown" in capsys.readouterr().out
