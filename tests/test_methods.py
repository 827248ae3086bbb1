import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig


def _state_and_bank(n=150, cap=512, W=48, H=32, use_nir=False, seed=0,
                    with_depth=False):
    from sparse_view_3dgs_pack_tpu.train.step import CameraBank

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, n_images=3, sh_degree=2,
                               capacity=cap, use_nir=use_nir)
    cams = testing.make_orbit_cameras(3, radius=3.5, width=W, height_px=H)
    for c in cams:
        c.image = rng.random((H, W, 3)).astype(np.float32)
        c.alpha_mask = np.ones((H, W), np.float32)
        if with_depth:
            c.invdepthmap = rng.random((H, W)).astype(np.float32) * 100
            c.depth_mask = np.ones((H, W), np.float32)
            c.depth_reliable = True
        if use_nir:
            c.nir = rng.random((H, W)).astype(np.float32)
    bank = CameraBank.from_cameras(cams)
    return state, bank, cams


CFG = RasterConfig(max_pairs=1 << 13, max_per_tile=256, tile_batch=6)


def test_hashgrid_encode():
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import (HashGridConfig,
                                                        hashgrid_encode,
                                                        init_hashgrid)

    cfg = HashGridConfig(num_levels=4, level_dim=2, base_resolution=4,
                         log2_hashmap_size=10, desired_resolution=32)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1,
                           maxval=1)
    out = hashgrid_encode(table, x, cfg)
    assert out.shape == (32, 8)
    # continuity: nearby points → nearby encodings
    out2 = hashgrid_encode(table, x + 1e-4, cfg)
    assert float(jnp.abs(out - out2).max()) < 1e-2
    # differentiable w.r.t. table
    g = jax.grad(lambda t: hashgrid_encode(t, x, cfg).sum())(table)
    assert float(jnp.abs(g).sum()) > 0


def test_sh_encode_matches_eval_sh_dims():
    from sparse_view_3dgs_pack_tpu.ops.shencode import sh_encode

    d = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = sh_encode(d, degree=4)
    assert out.shape == (10, 16)
    # degree-0 term is the constant
    np.testing.assert_allclose(out[:, 0], 0.28209479, atol=1e-6)


def test_neural_field_forward():
    from sparse_view_3dgs_pack_tpu.models.neural_field import (
        NeuralFieldConfig, init_neural_field, neural_forward)
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import HashGridConfig

    cfg = NeuralFieldConfig(grid=HashGridConfig(num_levels=4,
                                                log2_hashmap_size=10,
                                                desired_resolution=64))
    params = init_neural_field(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (20, 3), minval=-1,
                           maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (20, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sigma, color = neural_forward(params, x, d, cfg)
    assert sigma.shape == (20,)
    assert color.shape == (20, 3)
    assert (np.asarray(color) > -0.0011).all()
    assert (np.asarray(color) < 1.0011).all()


def test_fsgs_step_runs_and_learns():
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import FSGSConfig, fsgs_step

    state, bank, _ = _state_and_bank(with_depth=True)
    from sparse_view_3dgs_pack_tpu.train.optim import init_adam
    adam = init_adam(state.params)
    cfg = FSGSConfig(width=48, height=32, sh_degree=2, raster=CFG)
    lrs = {k: jnp.asarray(1e-2) for k in state.params}
    losses = []
    for i in range(8):
        state, adam, m = fsgs_step(state, adam, bank,
                                   jnp.asarray(i % 3, jnp.int32), lrs,
                                   jnp.asarray(0.05), jnp.asarray(1, jnp.int32),
                                   jnp.zeros(3), cfg)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert float(state.denom.max()) > 0  # stats accumulated


def test_fsgs_proximity():
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import proximity_candidates

    state, _, _ = _state_and_bank()
    mask, idx, dist = proximity_candidates(state, jnp.asarray(1e-6))
    assert mask.shape == (state.capacity,)
    assert idx.shape == (state.capacity, 3)


def test_fsgs_proximity_densify_fires():
    """Proximity appends must fire and grow n_alive when outliers exist
    (reference `FSGS/scene/gaussian_model.py:405-421,475-482`)."""
    from sparse_view_3dgs_pack_tpu.train.densify import proximity_densify
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import fsgs_densify_masks
    from sparse_view_3dgs_pack_tpu.train.optim import init_adam

    state, _, _ = _state_and_bank()
    # make every alive gaussian an "outlier": large scale + tiny extent
    params = dict(state.params)
    params["scaling"] = jnp.where(state.alive[:, None],
                                  jnp.log(jnp.full_like(
                                      params["scaling"], 0.5)),
                                  params["scaling"])
    state = state._replace(params=params)
    adam = init_adam(state.params)
    extent = jnp.asarray(1e-4)
    prox_mask, nn_idx, split_mask = fsgs_densify_masks(
        state, extent, jnp.asarray(10.0))
    assert bool(prox_mask.any()), "outlier construction must select sources"
    n0 = int(state.n_alive)
    res = proximity_densify(state, adam, nn_idx, prox_mask)
    assert int(res.appended) > 0
    assert int(res.state.n_alive) == n0 + int(res.appended)
    # appended midpoints sit between source and neighbour
    mid = res.state.params["xyz"][n0]
    assert np.isfinite(np.asarray(mid)).all()
    # dist-based split mask selects too (dist >> 10·extent here)
    assert bool(split_mask.any())


def test_fsgs_knn_ignores_dead_slots():
    """knn3 with a validity mask must never return dead capacity slots as
    neighbours (their coordinates are stale/garbage)."""
    from sparse_view_3dgs_pack_tpu.ops.knn import knn3

    rng = np.random.default_rng(3)
    pts = np.zeros((64, 3), np.float32)
    pts[:40] = rng.uniform(-1, 1, (40, 3))
    pts[40:] = 0.0   # dead slots parked at origin — tempting false NNs
    valid = np.arange(64) < 40
    d, idx = knn3(jnp.asarray(pts), valid=jnp.asarray(valid))
    assert (np.asarray(idx)[:40] < 40).all()


def test_fsgs_confidence_scales_gradients():
    """FSGS confidence (N2): forward identical, backward scaled per Gaussian
    (`dgr_fsgs/__init__.py:146-158`)."""
    from sparse_view_3dgs_pack_tpu.renderer import render_core

    state, bank, _ = _state_and_bank()
    cam = bank.camera(jnp.asarray(0, jnp.int32))
    alive_f = state.alive.astype(jnp.float32)
    conf = jnp.full((state.capacity,), 0.25)

    def loss(params, confidence):
        res = render_core(params, alive_f, jnp.eye(3, 4), cam, 48, 32,
                          jnp.zeros(3), sh_degree_active=2, config=CFG,
                          confidence=confidence)
        return (res.render ** 2).mean()

    img_c = loss(state.params, conf)
    img_1 = loss(state.params, jnp.ones((state.capacity,)))
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_1),
                               rtol=1e-6)  # forward unchanged

    g_c = jax.grad(loss)(state.params, conf)["xyz"]
    g_1 = jax.grad(loss)(state.params, jnp.ones((state.capacity,)))["xyz"]
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_1) * 0.25,
                               rtol=1e-5, atol=1e-12)


def test_fsgs_warped_pseudo_step_runs():
    from sparse_view_3dgs_pack_tpu.train.fsgs_loop import (
        FSGSConfig, fsgs_warped_pseudo_step)
    from sparse_view_3dgs_pack_tpu.train.optim import init_adam

    state, bank, cams = _state_and_bank(with_depth=True)
    adam = init_adam(state.params)
    cfg = FSGSConfig(width=48, height=32, sh_degree=2, raster=CFG)
    lrs = {k: jnp.asarray(1e-2) for k in state.params}
    src = bank.camera(jnp.asarray(0, jnp.int32))
    dst = bank.camera(jnp.asarray(1, jnp.int32))
    state2, adam2, loss = fsgs_warped_pseudo_step(
        state, adam, src, bank.invdepth[0], dst, lrs, jnp.asarray(1.0),
        jnp.asarray(1, jnp.int32), jnp.zeros(3), cfg)
    assert np.isfinite(float(loss))


def test_dng_step_runs():
    from sparse_view_3dgs_pack_tpu.models.neural_field import (
        NeuralFieldConfig, init_neural_field)
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import HashGridConfig
    from sparse_view_3dgs_pack_tpu.train.dng_loop import DNGConfig, dng_step
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_tree_adam)
    from sparse_view_3dgs_pack_tpu.train.dng_loop import neural_lr_tree

    state, bank, _ = _state_and_bank(with_depth=True)
    adam = init_adam(state.params)
    ncfg = NeuralFieldConfig(grid=HashGridConfig(num_levels=4,
                                                 log2_hashmap_size=10,
                                                 desired_resolution=64))
    nparams = init_neural_field(jax.random.PRNGKey(0), ncfg)
    nadam = init_tree_adam(nparams)
    nlrs = neural_lr_tree(nparams, 5e-3, 5e-4)
    cfg = DNGConfig(width=48, height=32, sh_degree=2, raster=CFG,
                    neural=ncfg, use_soft=True, use_smooth=True)
    lrs = {k: jnp.asarray(1e-3) for k in state.params}
    xyz0 = np.asarray(state.params["xyz"][:10]).copy()
    for i in range(3):
        state, nparams, adam, nadam, m = dng_step(
            state, nparams, adam, nadam, bank, jnp.asarray(0, jnp.int32),
            jnp.asarray(i % 12, jnp.int32), lrs, nlrs,
            jnp.asarray(1, jnp.int32), jnp.zeros(3), cfg)
    assert np.isfinite(float(m["loss"]))
    # all three passes move params: xyz moved (hard+photo), neural moved
    assert not np.allclose(np.asarray(state.params["xyz"][:10]), xyz0)


def test_nir_step_runs():
    from sparse_view_3dgs_pack_tpu.train.nir_loop import NIRConfig, nir_step
    from sparse_view_3dgs_pack_tpu.train.optim import init_adam
    from sparse_view_3dgs_pack_tpu.train.step import StepConfig

    state, bank, _ = _state_and_bank(use_nir=True)
    adam = init_adam(state.params)
    base = StepConfig(width=48, height=32, sh_degree=2, raster=CFG,
                      dwt_enable=True, patch_dwt_enable=True, patch_size=16)
    cfg = NIRConfig(base=base, nir_weight=0.5)
    lrs = {k: jnp.asarray(1e-2) for k in state.params}
    carry = jnp.ones(())
    gain0 = float(state.params["nir_gain"][0])
    for i in range(6):
        state, adam, carry, m = nir_step(state, adam, carry, bank,
                                         jnp.asarray(i % 3, jnp.int32), lrs,
                                         jnp.asarray(1, jnp.int32),
                                         jnp.zeros(3), cfg)
    assert np.isfinite(float(m["loss"]))
    assert float(m["nir"]) > 0
    # NIR gradient path reaches the albedo/gain params
    assert float(state.params["nir_gain"][0]) != gain0


def test_dng_step_sh_fallback():
    """DNGaussian with use_neural=0 — the SH-color fallback model
    (reference `gaussian_model_sh.py` + `render_sh` duals,
    `DNGaussian/gaussian_renderer/__init__.py:21-445`), CLI-reachable via
    `--use_neural 0`."""
    from sparse_view_3dgs_pack_tpu.models.neural_field import (
        NeuralFieldConfig, init_neural_field)
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import HashGridConfig
    from sparse_view_3dgs_pack_tpu.train.dng_loop import (DNGConfig, dng_step,
                                                          neural_lr_tree)
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_tree_adam)

    state, bank, _ = _state_and_bank(with_depth=True)
    adam = init_adam(state.params)
    ncfg = NeuralFieldConfig(grid=HashGridConfig(num_levels=4,
                                                 log2_hashmap_size=10,
                                                 desired_resolution=64))
    nparams = init_neural_field(jax.random.PRNGKey(0), ncfg)
    nadam = init_tree_adam(nparams)
    nlrs = neural_lr_tree(nparams, 5e-3, 5e-4)
    cfg = DNGConfig(width=48, height=32, sh_degree=2, raster=CFG,
                    neural=ncfg, use_neural=False)
    lrs = {k: jnp.asarray(1e-3) for k in state.params}
    xyz0 = np.asarray(state.params["xyz"][:10]).copy()
    np0 = jax.tree.map(lambda a: np.asarray(a).copy(), nparams)
    for i in range(3):
        state, nparams, adam, nadam, m = dng_step(
            state, nparams, adam, nadam, bank, jnp.asarray(0, jnp.int32),
            jnp.asarray(i % 12, jnp.int32), lrs, nlrs,
            jnp.asarray(1, jnp.int32), jnp.zeros(3), cfg)
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(state.params["xyz"][:10]), xyz0)
    # neural field untouched in the SH path
    for a, b in zip(jax.tree.leaves(nparams), jax.tree.leaves(np0)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_dng_step_dtu_masked_loss():
    """DTU variant: the photometric loss is computed on masked image AND
    masked gt (reference `train_dtu.py:84-105`) — pixels outside the mask
    must not influence the loss at all."""
    from sparse_view_3dgs_pack_tpu.models.neural_field import (
        NeuralFieldConfig, init_neural_field)
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import HashGridConfig
    from sparse_view_3dgs_pack_tpu.train.dng_loop import (DNGConfig, dng_step,
                                                          neural_lr_tree)
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_tree_adam)
    from sparse_view_3dgs_pack_tpu.train.step import CameraBank

    W, H = 48, 32
    rng = np.random.default_rng(0)

    def build(gt_noise_in_masked_region):
        state, _, cams = _state_and_bank(with_depth=True)
        for c in cams:
            mask = np.ones((H, W), np.float32)
            mask[:, W // 2:] = 0.0           # right half excluded
            c.alpha_mask = mask
            if gt_noise_in_masked_region:
                img = c.image.copy()
                img[:, W // 2:] = rng.random((H, W - W // 2, 3))
                c.image = img
        return state, CameraBank.from_cameras(cams)

    ncfg = NeuralFieldConfig(grid=HashGridConfig(num_levels=4,
                                                 log2_hashmap_size=10,
                                                 desired_resolution=64))
    nparams = init_neural_field(jax.random.PRNGKey(0), ncfg)
    nadam = init_tree_adam(nparams)
    nlrs = neural_lr_tree(nparams, 5e-3, 5e-4)
    cfg = DNGConfig(width=W, height=H, sh_degree=2, raster=CFG,
                    neural=ncfg, use_mask=True)
    lrs = {k: jnp.asarray(0.0) for k in _state_and_bank()[0].params}

    losses = []
    for noisy in (False, True):
        state, bank = build(noisy)
        _, _, _, _, m = dng_step(
            state, nparams, init_adam(state.params), nadam, bank,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), lrs, nlrs,
            jnp.asarray(1, jnp.int32), jnp.zeros(3), cfg)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # changing gt ONLY inside the masked-out region leaves the loss intact
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


def test_dng_e2e_blender_and_dtu_variants(tmp_path):
    """`train_dngaussian(dataset_type=...)` end-to-end on a tiny scene:
    'blender' renders on a white background (`train_blender.py`), 'dtu'
    applies the masked loss (`train_dtu.py`). Smoke + semantics."""
    from test_train_e2e import _Args, _Opt, _Pipe, _write_scene
    from sparse_view_3dgs_pack_tpu.train.dng_loop import train_dngaussian

    scene_dir = _write_scene(str(tmp_path / "scene"))
    for dtype in ("blender", "dtu"):
        args = _Args()
        args.source_path = scene_dir
        args.model_path = str(tmp_path / f"dng_{dtype}")
        args.save_iterations = []
        args.depth_estimator = "none"
        os.makedirs(args.model_path, exist_ok=True)
        opt = _Opt()
        opt.iterations = 8
        opt.densify_from_iter = 100           # no densify in 8 iters
        opt.error_tolerance = 0.2
        opt.shape_pena = 0.001
        opt.scale_pena = 0.001
        opt.opa_pena = 0.01
        opt.soft_depth_start = 1000
        opt.hard_depth_start = 0
        opt.prune_threshold = 0.01
        opt.use_neural = 1
        scene = train_dngaussian(args, opt, _Pipe(), args,
                                 dataset_type=dtype)
        xyz = np.asarray(
            scene.gaussians.params["xyz"][:int(scene.gaussians.n_alive)])
        assert np.isfinite(xyz).all()
        # neural field persisted beside the final PLY so render.py can
        # reconstruct training-time colors (use_neural=1 here)
        assert os.path.exists(os.path.join(
            args.model_path, "point_cloud", "iteration_8",
            "neural_renderer.npz"))


def test_dng_neural_npz_roundtrip_and_render(tmp_path):
    """save/load_neural_npz round-trip bit-exactly, and `render_neural`
    reproduces the training-time pass-3 image — NOT the SH render (the
    reference reloads the GridRenderer at render time,
    `DNGaussian/render.py:138-147`; rendering a DNG PLY via SH would show
    init colors)."""
    from sparse_view_3dgs_pack_tpu.models.neural_field import (
        NeuralFieldConfig, init_neural_field, load_neural_npz,
        save_neural_npz)
    from sparse_view_3dgs_pack_tpu.ops.hashgrid import HashGridConfig
    from sparse_view_3dgs_pack_tpu.renderer import (render, render_core,
                                                    render_neural)
    from sparse_view_3dgs_pack_tpu.train.dng_loop import (DNGConfig,
                                                          _neural_outputs)

    state, _, cams = _state_and_bank()
    ncfg = NeuralFieldConfig(
        grid=HashGridConfig(num_levels=4, level_dim=2, base_resolution=4,
                            log2_hashmap_size=10, desired_resolution=32),
        bound=2.0)
    nparams = init_neural_field(jax.random.PRNGKey(3), ncfg)
    path = str(tmp_path / "nested" / "neural_renderer.npz")
    save_neural_npz(path, nparams, ncfg)
    loaded, lcfg = load_neural_npz(path)
    assert lcfg == ncfg
    for a, b in zip(jax.tree_util.tree_leaves(nparams),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cam = cams[0]
    bg = jnp.zeros(3)
    out_n = render_neural(state, cam, bg, neural_params=loaded,
                          neural_cfg=lcfg, config=CFG, use_pallas=False)
    assert np.isfinite(np.asarray(out_n.render)).all()
    # neural rendering must differ from the SH render of the same state
    out_sh = render(state, cam, bg, config=CFG, use_pallas=False)
    assert float(jnp.abs(out_n.render - out_sh.render).max()) > 1e-3
    # ... and must equal the training pass's override_color/opacity render
    dcfg = DNGConfig(width=cam.width, height=cam.height, sh_degree=2,
                     raster=CFG, neural=ncfg)
    color, opac = _neural_outputs(loaded, state.params,
                                  jnp.asarray(cam.params().cam_center), dcfg)
    ref = render_core(state.params, state.alive.astype(jnp.float32),
                      jnp.eye(3, 4), cam.params(), cam.width, cam.height,
                      bg, sh_degree_active=2, config=CFG,
                      override_color=color, opacity_override=opac,
                      inference=True)
    np.testing.assert_allclose(np.asarray(out_n.render),
                               np.asarray(ref.render), atol=1e-5)
