import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu.models import gaussians as gm
from sparse_view_3dgs_pack_tpu.train import densify as dz
from sparse_view_3dgs_pack_tpu.train import optim as op


def _state(n=20, cap=64, seed=0, sh_degree=2):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    return gm.create_from_pcd(pts, cols, n_images=2, sh_degree=sh_degree,
                              capacity=cap)


def test_create_from_pcd():
    st = _state()
    assert st.capacity == 64
    assert int(st.n_alive) == 20
    assert st.params["features_rest"].shape == (64, 8, 3)
    assert bool(st.alive[19]) and not bool(st.alive[20])
    op_act = gm.get_opacity(st)
    np.testing.assert_allclose(np.asarray(op_act[:20]), 0.1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(op_act[20:]), 0.0)
    # scales positive and finite for alive
    s = np.asarray(gm.get_scaling(st))[:20]
    assert np.isfinite(s).all() and (s > 0).all()


def test_ply_roundtrip(tmp_path):
    st = _state(sh_degree=3)
    path = str(tmp_path / "pc" / "point_cloud.ply")
    gm.save_ply(st, path)
    st2 = gm.load_ply(path, sh_degree=3, capacity=64)
    assert int(st2.n_alive) == 20
    for k in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity"):
        np.testing.assert_allclose(np.asarray(st2.params[k][:20]),
                                   np.asarray(st.params[k][:20]), atol=1e-6,
                                   err_msg=k)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(8, 3)).astype(np.float32)
    grads = [rng.normal(size=(8, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.tensor(p0, requires_grad=True)
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"xyz": jnp.asarray(p0)}
    st = op.init_adam(params)
    for g in grads:
        params, st = op.adam_update(params, {"xyz": jnp.asarray(g)}, st,
                                    {"xyz": 0.01})
    np.testing.assert_allclose(np.asarray(params["xyz"]),
                               tp.detach().numpy(), atol=1e-6)


def test_adam_visibility_mask():
    params = {"xyz": jnp.ones((4, 3))}
    st = op.init_adam(params)
    g = {"xyz": jnp.ones((4, 3))}
    vis = jnp.array([True, False, True, False])
    new, st = op.adam_update(params, g, st, {"xyz": 0.1}, visibility=vis)
    assert float(new["xyz"][0, 0]) != 1.0
    assert float(new["xyz"][1, 0]) == 1.0
    assert float(st.m["xyz"][1, 0]) == 0.0


def test_densify_clone():
    st = _state(n=10, cap=64)
    # force small scales so the grad-selected points clone rather than split
    st = st._replace(params={**st.params,
                             "scaling": jnp.full((64, 3), np.log(0.01))})
    ad = op.init_adam(st.params)
    # mark gaussians 0,1 with high grads
    st = st._replace(
        xyz_gradient_accum=jnp.zeros(64).at[0].set(10.0).at[1].set(10.0),
        denom=jnp.zeros(64).at[:10].set(1.0))
    res = dz.densify_and_prune(st, ad, jax.random.PRNGKey(0),
                               max_grad=1.0, min_opacity=0.005,
                               extent=100.0)  # huge extent → all "small"
    assert int(res.requested) == 2
    assert int(res.appended) == 2
    assert int(res.state.n_alive) == 12
    # clones are exact copies of sources
    xyz = np.asarray(res.state.params["xyz"])
    assert any(np.allclose(xyz[10 + i], np.asarray(st.params["xyz"][0]))
               for i in range(2))
    # stats reset
    assert float(res.state.xyz_gradient_accum.sum()) == 0.0


def test_densify_split():
    st = _state(n=10, cap=64)
    ad = op.init_adam(st.params)
    st = st._replace(
        xyz_gradient_accum=jnp.zeros(64).at[3].set(10.0),
        denom=jnp.zeros(64).at[:10].set(1.0))
    res = dz.densify_and_prune(st, ad, jax.random.PRNGKey(0),
                               max_grad=1.0, min_opacity=0.005,
                               extent=1e-6)  # tiny extent → all "big" → split
    # one split: +2 new, original pruned → 11 alive
    assert int(res.requested) == 2
    assert int(res.state.n_alive) == 11
    # no remaining point equals the split original
    xyz = np.asarray(res.state.params["xyz"])[:11]
    orig = np.asarray(st.params["xyz"][3])
    assert not any(np.allclose(xyz[i], orig) for i in range(11))
    # new scales = old/1.6
    s_old = np.asarray(gm.get_scaling(st))[3]
    s_new = np.asarray(jnp.exp(res.state.params["scaling"][:11]))
    matches = [i for i in range(11)
               if np.allclose(s_new[i], s_old / 1.6, rtol=1e-4)]
    assert len(matches) == 2


def test_prune_by_opacity():
    st = _state(n=10, cap=64)
    ad = op.init_adam(st.params)
    # make gaussians 2 and 5 transparent
    opac = st.params["opacity"].at[2].set(-10.0).at[5].set(-10.0)
    st = st._replace(params={**st.params, "opacity": opac})
    keep_xyz = {tuple(np.asarray(st.params["xyz"][i]))
                for i in range(10) if i not in (2, 5)}
    res = dz.densify_and_prune(st, ad, jax.random.PRNGKey(0), max_grad=1.0,
                               min_opacity=0.005, extent=100.0)
    assert int(res.state.n_alive) == 8
    got = {tuple(np.asarray(res.state.params["xyz"][i])) for i in range(8)}
    assert got == keep_xyz
    assert int(res.pruned) == 2


def test_densify_overflow_drops():
    st = _state(n=10, cap=16)
    st = st._replace(params={**st.params,
                             "scaling": jnp.full((16, 3), np.log(0.01))})
    ad = op.init_adam(st.params)
    st = st._replace(
        xyz_gradient_accum=jnp.zeros(16).at[:10].set(10.0),
        denom=jnp.zeros(16).at[:10].set(1.0))
    res = dz.densify_and_prune(st, ad, jax.random.PRNGKey(0), max_grad=1.0,
                               min_opacity=0.005, extent=100.0)
    assert int(res.requested) == 10
    assert int(res.appended) == 6  # only room for 6
    assert int(res.state.n_alive) == 16


def test_reset_opacity():
    st = _state(n=10, cap=32)
    ad = op.init_adam(st.params)
    ad = ad._replace(m={**ad.m, "opacity": jnp.ones_like(ad.m["opacity"])})
    st2, ad2 = dz.reset_opacity(st, ad)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(st2.params["opacity"][:10])), 0.01,
        atol=1e-6)
    assert float(ad2.m["opacity"].sum()) == 0.0


def test_stats_accumulation():
    st = _state(n=10, cap=32)
    grads = jnp.zeros((32, 2)).at[0].set(jnp.array([0.01, 0.0]))
    radii = jnp.zeros(32, jnp.int32).at[0].set(5).at[1].set(3)
    st2 = dz.add_densification_stats(st, grads, radii, width=100, height=50)
    # grad scaled by W/2=50 → norm 0.5
    assert float(st2.xyz_gradient_accum[0]) == pytest.approx(0.5, rel=1e-5)
    assert float(st2.denom[0]) == 1.0 and float(st2.denom[1]) == 1.0
    assert float(st2.denom[2]) == 0.0
    assert float(st2.max_radii2d[0]) == 5.0


def test_grow_capacity():
    st = _state(n=10, cap=16)
    st2 = gm.grow_capacity(st, 64)
    assert st2.capacity == 64
    assert int(st2.n_alive) == 10
    np.testing.assert_allclose(np.asarray(st2.params["xyz"][:10]),
                               np.asarray(st.params["xyz"][:10]))
    assert not bool(st2.alive[10])


def test_grow_capacity_dead_slots_no_nan_grads():
    """Regression: grow_capacity used to zero-pad rotations; the quaternion
    normalisation's sqrt has an infinite gradient at 0, so dead slots turned
    their zero cotangents into NaN (0*inf), Adam wrote NaN params, and the
    garbage radii exploded the pair count ~20M at the first capacity growth
    of a long run."""
    import jax
    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu import testing
    from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_exposure_adam)
    from sparse_view_3dgs_pack_tpu.train.step import (CameraBank, StepCarry,
                                                      StepConfig, train_step)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, rng.random((60, 3)).astype(np.float32),
                               n_images=1, sh_degree=1, capacity=64)
    state = gm.grow_capacity(state, 128)
    # grown pad must be renderable-inert, not NaN-generating
    assert np.isfinite(np.asarray(state.params["rotation"])).all()
    assert np.asarray(state.params["rotation"])[64:, 0].min() > 0.5

    cams = testing.make_orbit_cameras(1, radius=3.5, width=32, height_px=32)
    cams[0].image = rng.random((32, 32, 3)).astype(np.float32)
    cams[0].alpha_mask = np.ones((32, 32), np.float32)
    bank = CameraBank.from_cameras(cams)
    cfg = StepConfig(width=32, height=32, sh_degree=1,
                     raster=RasterConfig(max_pairs=1 << 11, max_per_tile=64,
                                         tile_batch=2))
    adam = init_adam(state.params)
    out = train_step(state, adam, init_exposure_adam(state.exposure),
                     StepCarry(dwt_running_mean=jnp.ones(())), bank,
                     jnp.asarray(0, jnp.int32),
                     {k: jnp.asarray(1e-2) for k in state.params},
                     jnp.asarray(0.0), jnp.asarray(0.0),
                     jnp.asarray(1, jnp.int32), jnp.zeros(3), cfg)
    for k, v in out.state.params.items():
        assert np.isfinite(np.asarray(v)).all(), f"NaN in {k} after step"
    for k, v in out.adam.m.items():
        assert np.isfinite(np.asarray(v)).all(), f"NaN Adam moment for {k}"
