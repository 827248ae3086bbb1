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


def test_dp_step_runs_on_mesh():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
