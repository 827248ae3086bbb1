"""Golden tests for the Pallas rasterizer (interpret mode on CPU) vs the
dense oracle — forward values AND gradients (the same contract the reference
fused-ssim test establishes for its CUDA kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
    make_pallas_rasterizer
from sparse_view_3dgs_pack_tpu.ops.projection import Projected, project_gaussians
from sparse_view_3dgs_pack_tpu.ops.rasterize_ref import rasterize_dense

W, H = 64, 48


def _proj(n=250, seed=0, concentrate=False):
    cloud = testing.make_gaussian_cloud(seed, n, extent=1.0,
                                        scale_range=(0.02, 0.1))
    if concentrate:
        # pile most gaussians into one small region → one deep tile with
        # multiple chunks (tests the cross-chunk carries). Low opacities keep
        # T above the 1e-4 early-stop so the comparison is free of the
        # (order-sensitive) cutoff boundary.
        cloud["xyz"][: n // 2] = (cloud["xyz"][: n // 2] * 0.03)
        cloud["opacity"][:] = -4.5
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


def _run_pallas(proj, bg, grad=False, max_pairs=1 << 13,
                tile_x=16, tile_y=16):
    ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                               max_pairs, tile_x, tile_y)
    fn = make_pallas_rasterizer(W, H, proj.colors.shape[-1],
                                tile_x=tile_x, tile_y=tile_y)
    args = (proj.means2d, proj.depths, proj.conics, proj.colors,
            proj.opacities, ba.ids, ba.tile_starts, ba.tile_counts, bg)

    key = jax.random.PRNGKey(7)
    gw = [jax.random.normal(k, (H, W, c)) if c > 1 else
          jax.random.normal(k, (H, W))
          for k, c in zip(jax.random.split(key, 4), (3, 1, 1, 1))]

    def loss(m2, dep, con, col, op):
        c, invd, d, a = fn(m2, dep, con, col, op, *args[5:])
        return (jnp.sum(c * gw[0]) + jnp.sum(invd * gw[1])
                + jnp.sum(d * gw[2]) + jnp.sum(a * gw[3]))

    with pltpu.force_tpu_interpret_mode():
        outs = fn(*args)
        grads = (jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
                 if grad else None)
    return outs, grads, gw, ba


def _oracle(proj, bg, gw=None):
    ref = rasterize_dense(proj, W, H, bg)
    if gw is None:
        return ref, None

    def loss(m2, dep, con, col, op):
        r = rasterize_dense(Projected(
            means2d=m2, depths=dep, radii=proj.radii, conics=con,
            colors=col, opacities=op), W, H, bg)
        return (jnp.sum(r.color * gw[0]) + jnp.sum(r.invdepth * gw[1])
                + jnp.sum(r.depth * gw[2]) + jnp.sum(r.alpha * gw[3]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        proj.means2d, proj.depths, proj.conics, proj.colors, proj.opacities)
    return ref, grads


def test_pallas_forward_matches_oracle():
    proj = _proj()
    bg = jnp.array([0.1, 0.2, 0.3])
    (color, invd, depth, alpha), _, _, _ = _run_pallas(proj, bg)
    ref, _ = _oracle(proj, bg)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(invd), np.asarray(ref.invdepth),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=2e-6)


def test_pallas_gradients_match_oracle():
    proj = _proj(n=150, seed=1)
    bg = jnp.array([0.05, 0.1, 0.15])
    _, grads, gw, _ = _run_pallas(proj, bg, grad=True)
    _, ref_grads = _oracle(proj, bg, gw)
    names = ("means2d", "depths", "conics", "colors", "opacities")
    for g, rg, name in zip(grads, ref_grads, names):
        ga, rga = np.asarray(g), np.asarray(rg)
        # ignore culled gaussians (oracle masks them identically, but inf
        # depths produce no grads on either side)
        mask = np.asarray(proj.radii) > 0
        ga = ga[mask]
        rga = rga[mask]
        scale = max(np.abs(rga).max(), 1e-3)
        np.testing.assert_allclose(ga, rga, atol=3e-5 * scale, rtol=2e-3,
                                   err_msg=name)
        assert np.abs(ga).max() > 0, f"zero grads for {name}"


def test_pallas_gradients_match_oracle_32x16():
    """Rectangular training tiles: the backward kernel is tile-shape
    generic; 32x16 gradients must match the oracle exactly like 16x16."""
    proj = _proj(n=150, seed=3)
    bg = jnp.array([0.2, 0.05, 0.1])
    _, grads, gw, _ = _run_pallas(proj, bg, grad=True, tile_x=32, tile_y=16)
    _, ref_grads = _oracle(proj, bg, gw)
    names = ("means2d", "depths", "conics", "colors", "opacities")
    mask = np.asarray(proj.radii) > 0
    for g, rg, name in zip(grads, ref_grads, names):
        ga, rga = np.asarray(g)[mask], np.asarray(rg)[mask]
        scale = max(np.abs(rga).max(), 1e-3)
        np.testing.assert_allclose(ga, rga, atol=3e-5 * scale, rtol=2e-3,
                                   err_msg=name)
        assert np.abs(ga).max() > 0, f"zero grads for {name}"


@pytest.mark.timeout(600)
def test_pallas_multichunk_carries():
    proj = _proj(n=600, seed=2, concentrate=True)
    bg = jnp.zeros(3)
    ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                               1 << 14)
    assert int(ba.tile_counts.max()) > 256, "scene must exceed one chunk"
    (color, invd, depth, alpha), grads, gw, _ = _run_pallas(
        proj, bg, grad=True, max_pairs=1 << 14)
    ref, ref_grads = _oracle(proj, bg, gw)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=2e-5)
    for g, rg, name in zip(grads, ref_grads,
                           ("means2d", "depths", "conics", "colors",
                            "opacities")):
        mask = np.asarray(proj.radii) > 0
        ga, rga = np.asarray(g)[mask], np.asarray(rg)[mask]
        scale = max(np.abs(rga).max(), 1e-3)
        np.testing.assert_allclose(ga, rga, atol=1e-4 * scale, rtol=5e-3,
                                   err_msg=name)


def test_pallas_sticky_early_stop():
    """Regression: the T<1e-4 stop must be PERMANENT. A mid-list crossing
    followed by tiny alphas used to let pairs re-contribute, breaking the
    n_contrib prefix the backward replays (gradients exploded ~1e5x in real
    training)."""
    # many high-alpha gaussians at the same spot (forces a crossing), then
    # many very-low-alpha ones behind them
    n = 320
    cloud = testing.make_gaussian_cloud(9, n, extent=0.4,
                                        scale_range=(0.05, 0.15))
    cloud["xyz"][:] = cloud["xyz"] * 0.05  # all in one tile's view
    cloud["opacity"][:n // 2] = 4.0        # alpha ~0.98 front
    cloud["opacity"][n // 2:] = -4.8       # alpha ~0.008 behind
    cam = testing.make_orbit_cameras(1, radius=4.0, width=W, height_px=H)[0]
    p = cam.params()
    # order by depth so the high-alpha ones come first for some pixels
    proj = project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]),
        scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center),
        tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
        width=W, height=H, sh=jnp.asarray(cloud["features"]), sh_degree=0)
    bg = jnp.array([0.3, 0.3, 0.3])
    (color, invd, depth, alpha), grads, gw, ba = _run_pallas(
        proj, bg, grad=True, max_pairs=1 << 14)
    assert int(ba.tile_counts.max()) > 256  # crossing is mid-multi-chunk
    ref, ref_grads = _oracle(proj, bg, gw)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=5e-4)
    for g, rg, name in zip(grads, ref_grads,
                           ("means2d", "depths", "conics", "colors",
                            "opacities")):
        mask = np.asarray(proj.radii) > 0
        ga, rga = np.asarray(g)[mask], np.asarray(rg)[mask]
        scale = max(np.abs(rga).max(), 1e-3)
        # the old bug produced ~1e5 relative errors here
        np.testing.assert_allclose(ga, rga, atol=2e-3 * scale, rtol=5e-2,
                                   err_msg=name)


def test_pallas_inference_32x16_matches_oracle():
    """The 32x16-tile INFERENCE forward (fewer pairs, half the programs —
    used by render/eval/bench) must match the dense oracle like the 16x16
    training kernel does."""
    proj = _proj(n=220, seed=3)
    bg = jnp.array([0.25, 0.1, 0.4])
    ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                       1 << 13, tile=32, tile_y=16)
    fn = make_pallas_rasterizer(W, H, 3, inference=True, tile_x=32,
                                tile_y=16)
    with pltpu.force_tpu_interpret_mode():
        color, invd, depth, alpha = fn(
            proj.means2d, proj.depths, proj.conics, proj.colors,
            proj.opacities, ba.ids, ba.tile_starts, ba.tile_counts, bg)
    from sparse_view_3dgs_pack_tpu.ops.rasterize_ref import rasterize_dense
    ref = rasterize_dense(proj, W, H, bg)
    # inference tolerances: bf16 single-pass blend + non-sticky cutoff
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=5e-3)
    # 32x16 binning produces strictly fewer or equal pairs than 16x16
    ba16 = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                         1 << 13)
    assert int(ba.total_pairs) <= int(ba16.total_pairs)
