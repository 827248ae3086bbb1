import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import (RasterConfig,
                                                           rasterize_binned)

W, H = 64, 128  # 8 tile rows → bands of 1 row on 8 devices


def _proj(n=200):
    cloud = testing.make_gaussian_cloud(0, n, extent=1.0,
                                        scale_range=(0.02, 0.1))
    cam = testing.make_orbit_cameras(1, radius=4.0, width=W, height_px=H)[0]
    p = cam.params()
    return project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]),
        scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center),
        tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
        width=W, height=H, sh=jnp.asarray(cloud["features"]), sh_degree=0)


def test_tile_parallel_matches_single_device():
    from sparse_view_3dgs_pack_tpu.parallel.dp import make_mesh
    from sparse_view_3dgs_pack_tpu.parallel.tiles import render_tile_parallel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    proj = _proj()
    cfg = RasterConfig(max_pairs=1 << 13, max_per_tile=256, tile_batch=4)
    bg = jnp.array([0.1, 0.2, 0.3])

    out_par = render_tile_parallel(proj, W, H, bg, mesh, cfg)

    binning = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                            cfg.max_pairs)
    ref = rasterize_binned(proj, binning, W, H, bg, cfg)

    np.testing.assert_allclose(np.asarray(out_par.color),
                               np.asarray(ref.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_par.alpha),
                               np.asarray(ref.alpha), atol=2e-5)


def test_tile_parallel_cli_render_fn_bit_equal():
    """The render.py --tile_parallel path (make_tile_parallel_render_fn)
    must match the single-device renderer bit-for-bit — including a height
    whose tile rows do NOT divide evenly across devices (112 px = 7 tile
    rows on 8 devices → padded trailing band)."""
    from sparse_view_3dgs_pack_tpu.models import gaussians as gm
    from sparse_view_3dgs_pack_tpu.parallel.dp import make_mesh
    from sparse_view_3dgs_pack_tpu.parallel.tiles import \
        make_tile_parallel_render_fn
    from sparse_view_3dgs_pack_tpu.renderer import render

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    w, h = 64, 112
    rng = np.random.default_rng(1)
    state = gm.create_from_pcd(
        rng.uniform(-1, 1, (150, 3)).astype(np.float32),
        rng.random((150, 3)).astype(np.float32),
        n_images=1, sh_degree=1, capacity=256)
    cam = testing.make_orbit_cameras(1, radius=3.5, width=w, height_px=h)[0]
    bg = jnp.array([0.2, 0.1, 0.4])

    tp_fn = make_tile_parallel_render_fn(make_mesh(8), w, h)
    tp = tp_fn(state, cam, bg)
    ref = render(state, cam, bg, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(tp.render),
                                  np.asarray(ref.render))
    np.testing.assert_array_equal(np.asarray(tp.alpha),
                                  np.asarray(ref.alpha))
    assert int(tp.n_pairs) > 0


def test_dp_step_runs_on_mesh():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def _dp_train(n_devices, iters=30, size=32, n_gauss=96):
    """Run `iters` DP steps of the FULL objective on an n-device mesh over a
    fixed 8-view batch; returns final params."""
    from sparse_view_3dgs_pack_tpu.models import gaussians as gm
    from sparse_view_3dgs_pack_tpu.parallel.dp import (ViewBatch,
                                                       build_dp_train_step,
                                                       make_mesh, replicate,
                                                       shard_batch)
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_exposure_adam)
    from sparse_view_3dgs_pack_tpu.train.step import (CameraBank, StepCarry,
                                                      StepConfig)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n_gauss, 3)).astype(np.float32)
    cols = rng.random((n_gauss, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, n_images=8, sh_degree=1,
                               capacity=128)
    cams = testing.make_orbit_cameras(8, radius=3.5, width=size,
                                      height_px=size)
    for c in cams:
        c.image = np.random.default_rng(c.uid).random(
            (size, size, 3)).astype(np.float32)
        c.alpha_mask = np.ones((size, size), np.float32)
    bank = CameraBank.from_cameras(cams)

    mesh = make_mesh(n_devices)
    cfg = StepConfig(width=size, height=size, sh_degree=1,
                     raster=RasterConfig(max_pairs=1 << 12, max_per_tile=128,
                                         tile_batch=4),
                     dwt_enable=True)
    step = build_dp_train_step(cfg, mesh)
    batch = shard_batch(ViewBatch.gather(bank, list(range(8))), mesh)
    state = replicate(state, mesh)
    adam = replicate(init_adam(state.params), mesh)
    exp_adam = replicate(init_exposure_adam(state.exposure), mesh)
    carry = StepCarry(dwt_running_mean=jnp.ones(()))
    lrs = {k: jnp.asarray(2e-3) for k in state.params}
    with mesh:
        for _ in range(iters):
            state, adam, exp_adam, carry, metrics = step(
                state, adam, exp_adam, carry, batch, lrs,
                jnp.asarray(1e-3), jnp.asarray(0.0),
                jnp.asarray(1, jnp.int32), jnp.zeros(3))
    return jax.tree.map(np.asarray, state.params), float(metrics["l1"])


@pytest.mark.timeout(900)
def test_dp_training_matches_single_device():
    """N-device DP must compute the same batch-SGD update as one device.

    One step must agree to float tolerance (catches wrong psum scaling /
    missing loss terms); 30 steps must reach the same loss level (param-wise
    equality is not expected — reduction-order rounding feeds Adam's
    1/sqrt(v) and drifts chaotically on near-zero-gradient params)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p8_1, _ = _dp_train(8, iters=1)
    p1_1, _ = _dp_train(1, iters=1)
    for k in p1_1:
        np.testing.assert_allclose(
            p8_1[k], p1_1[k], atol=1e-5, rtol=1e-4,
            err_msg=f"DP single-step mismatch in {k}")
    p8, l8 = _dp_train(8, iters=30)
    p1, l1 = _dp_train(1, iters=30)
    assert np.isfinite(l8) and np.isfinite(l1)
    assert abs(l8 - l1) / max(l1, 1e-6) < 0.05, (l8, l1)


@pytest.mark.timeout(900)
def test_trainer_dp_cli_path_reaches_single_device_psnr():
    """The CLI-reachable DP path (`Trainer(data_parallel=N)`, wired to
    `train.py --data_parallel`) must train to the same PSNR as the
    single-device trainer on the same scene — including densify events on
    replicated state."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sparse_view_3dgs_pack_tpu.testing import (make_dryrun_opt,
                                                   make_dryrun_pipe,
                                                   make_fake_scene)
    from sparse_view_3dgs_pack_tpu.train.loop import Trainer

    def run(dp):
        scene = make_fake_scene(n_points=160, n_views=8, width=32,
                                height_px=32, capacity=256, sh_degree=1,
                                seed=3)
        opt = make_dryrun_opt(iterations=60, dwt_enable=False,
                              patch_dwt_enable=False,
                              densification_interval=20,
                              densify_from_iter=10, densify_until_iter=50,
                              densify_grad_threshold=1e-4)
        tr = Trainer(scene, opt, make_dryrun_pipe(), scene.args,
                     method="3dgs", quiet=True, data_parallel=dp)
        random.seed(0)
        p0 = tr.evaluate(scene.getTrainCameras()[:4])["psnr"]
        for _ in range(opt.iterations):
            tr.step()
        p1 = tr.evaluate(scene.getTrainCameras()[:4])["psnr"]
        return p0, p1

    import random
    s0, s1 = run(1)
    d0, d1 = run(8)
    assert d1 > d0 + 1.0, (d0, d1)          # DP actually learns
    assert d1 >= s1 - 0.5, (s1, d1)         # parity with single device
