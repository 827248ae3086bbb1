#!/usr/bin/env python3
"""Rendering CLI — flag-compatible with the reference `render.py`
(`LGDWT-GS/render.py:62-77`): loads the trained PLY at --iteration (or max),
renders train/test sets to renders/ + gt/ PNGs. --video renders an FSGS-style
spiral/ellipse camera path to mp4 (`FSGS/render.py:55-81`)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _u8_fn():
    """Device-side [0,1]→u8 (same truncation as the previous host code):
    fetching 3 B/px instead of 12 B/px quarters the host-link traffic."""
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda x: (jnp.clip(x, 0.0, 1.0) * 255)
                   .astype(jnp.uint8))


def render_set(model_path, name, iteration, views, trainer_state, bg,
               raster_cfg, antialiasing, active_sh, window=32,
               render_fn=None):
    import numpy as np
    from collections import deque
    from PIL import Image as PILImage

    from sparse_view_3dgs_pack_tpu.renderer import render
    if render_fn is None:
        render_fn = render

    render_path = os.path.join(model_path, name, f"ours_{iteration}",
                               "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    # dispatch-ahead window: renders for later views run while earlier
    # views fetch + PNG-encode (a strictly serial loop left the device
    # idle during every encode — 3 s/view over the remote tunnel)
    to_u8 = _u8_fn()
    pending = deque()

    def drain(keep):
        while len(pending) > keep:
            idx, view, dev = pending.popleft()
            PILImage.fromarray(np.asarray(dev)).save(
                os.path.join(render_path, f"{idx:05d}.png"))
            if view.image is not None:
                gt = (np.clip(view.image, 0, 1) * 255).astype(np.uint8)
                PILImage.fromarray(gt).save(
                    os.path.join(gts_path, f"{idx:05d}.png"))

    for idx, view in enumerate(views):
        res = render_fn(trainer_state, view, bg, sh_degree_active=active_sh,
                        antialiasing=antialiasing, config=raster_cfg)
        pending.append((idx, view, to_u8(res.render)))
        drain(window - 1)
    drain(0)


def _depth_colormap(depth, alpha):
    """Percentile-normalised -log(depth) turbo-style colormap, the
    DNGaussian spiral-video visualisation (`DNGaussian/spiral.py:28-95`)."""
    import numpy as np

    d = np.asarray(depth, np.float32)
    w = np.clip(np.asarray(alpha, np.float32), 0, 1)
    v = -np.log(np.maximum(d, 1e-6))
    flat = v.reshape(-1)
    wf = w.reshape(-1)
    order = np.argsort(flat)
    acc = np.cumsum(wf[order])
    if acc[-1] <= 0:
        return np.zeros(d.shape + (3,), np.uint8)
    lo, hi = np.interp([0.005 * acc[-1], 0.995 * acc[-1]], acc, flat[order])
    x = np.clip((v - min(lo, hi)) / max(abs(hi - lo), 1e-9), 0, 1)
    # compact turbo-like polynomial ramp (blue → green → red)
    r = np.clip(1.6 * x - 0.3, 0, 1)
    g = np.clip(1.7 - np.abs(2.4 * x - 1.2), 0, 1)
    b = np.clip(1.2 - 1.6 * x, 0, 1)
    rgb = np.stack([r, g, b], -1) * w[..., None]
    return (rgb * 255).astype(np.uint8)


def render_video(model_path, iteration, views, state, bg, raster_cfg,
                 antialiasing, active_sh, fps=30, depth_video=False,
                 render_fn=None):
    """Spiral-path video (FSGS `render.py:55-81`); with depth_video also a
    depth-colormap spiral (DNGaussian `spiral.py`)."""
    import cv2
    import numpy as np

    from sparse_view_3dgs_pack_tpu.renderer import render
    if render_fn is None:
        render_fn = render
    from sparse_view_3dgs_pack_tpu.utils.pose_utils import (
        generate_ellipse_path, generate_spiral_path)

    os.makedirs(os.path.join(model_path, "video"), exist_ok=True)
    path_cams = generate_spiral_path(views, n_frames=120)
    h, w = views[0].height, views[0].width
    writer = cv2.VideoWriter(
        os.path.join(model_path, "video", f"ours_{iteration}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    dwriter = cv2.VideoWriter(
        os.path.join(model_path, "video", f"depth_ours_{iteration}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)) if depth_video else None
    from collections import deque
    to_u8 = _u8_fn()
    pending = deque()

    def drain(keep):
        while len(pending) > keep:
            dev, depth, alpha = pending.popleft()
            writer.write(cv2.cvtColor(np.asarray(dev), cv2.COLOR_RGB2BGR))
            if dwriter is not None:
                dm = _depth_colormap(depth, alpha)
                dwriter.write(cv2.cvtColor(dm, cv2.COLOR_RGB2BGR))

    for cam in path_cams:
        res = render_fn(state, cam, bg, sh_degree_active=active_sh,
                        antialiasing=antialiasing, config=raster_cfg)
        pending.append((to_u8(res.render),
                        res.expected_depth if dwriter is not None else None,
                        res.alpha if dwriter is not None else None))
        drain(15)
    drain(0)
    writer.release()
    if dwriter is not None:
        dwriter.release()


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    from sparse_view_3dgs_pack_tpu.config import (ModelParams,
                                                  PipelineParams,
                                                  get_combined_args)
    model = ModelParams(parser, sentinel=True)
    pipeline = PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--depth_video", action="store_true",
                        help="also write a depth-colormap spiral video "
                             "(DNGaussian spiral.py)")
    parser.add_argument("--fps", default=30, type=int)
    parser.add_argument("--tile_parallel", default=0, type=int,
                        help="shard image tile-rows across N devices "
                             "(-1 = all available); Gaussians replicated, "
                             "each device rasterises its own band "
                             "(SURVEY §5.8 image-space decomposition)")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    import os as _os
    if _os.environ.get("GS_FORCE_CPU"):
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    from sparse_view_3dgs_pack_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu.renderer import default_raster_config
    from sparse_view_3dgs_pack_tpu.scene import Scene
    from sparse_view_3dgs_pack_tpu.utils.general import safe_state

    safe_state(args.quiet)
    dataset = model.extract(args)
    pipe = pipeline.extract(args)
    scene = Scene(dataset, load_iteration=args.iteration, shuffle=False,
                  sh_degree=dataset.sh_degree)
    state = scene.gaussians
    bg = jnp.asarray([1, 1, 1] if dataset.white_background else [0, 0, 0],
                     jnp.float32)
    cams = scene.getTrainCameras() or scene.getTestCameras()
    cfg = default_raster_config(state.capacity, cams[0].width,
                                cams[0].height,
                                max_pairs=getattr(pipe, "max_pairs", 0),
                                max_per_tile=getattr(pipe, "max_per_tile", 0))
    sh = state.max_sh_degree

    # DNGaussian models render through their neural color/opacity field —
    # the PLY alone holds init SH colors (reference `DNGaussian/render.py:
    # 138-147` reloads the GridRenderer from chkpnt before rendering)
    render_fn = None
    neural_path = os.path.join(dataset.model_path, "point_cloud",
                               f"iteration_{scene.loaded_iter}",
                               "neural_renderer.npz")
    if os.path.exists(neural_path):
        from functools import partial as _partial

        from sparse_view_3dgs_pack_tpu.models.neural_field import \
            load_neural_npz
        from sparse_view_3dgs_pack_tpu.renderer import render_neural
        neural_params, neural_cfg = load_neural_npz(neural_path)
        render_fn = _partial(render_neural, neural_params=neural_params,
                             neural_cfg=neural_cfg)
        print(f"Rendering with neural field: {neural_path}")

    if getattr(args, "tile_parallel", 0):
        import jax
        n_req = args.tile_parallel
        n_dev = len(jax.devices()) if n_req < 0 else min(n_req,
                                                         len(jax.devices()))
        if render_fn is not None:
            print("tile_parallel: neural-field rendering active, "
                  "falling back to single-device")
        elif n_dev < 2:
            print(f"tile_parallel: only {n_dev} device(s) available, "
                  "rendering single-device")
        else:
            from sparse_view_3dgs_pack_tpu.parallel.dp import make_mesh
            from sparse_view_3dgs_pack_tpu.parallel.tiles import \
                make_tile_parallel_render_fn
            mesh = make_mesh(n_dev)
            render_fn = make_tile_parallel_render_fn(
                mesh, cams[0].width, cams[0].height)
            print(f"tile_parallel: band-sharded rendering over {n_dev} "
                  "devices")

    if not args.skip_train and scene.getTrainCameras():
        render_set(dataset.model_path, "train", scene.loaded_iter,
                   scene.getTrainCameras(), state, bg, cfg,
                   pipe.antialiasing, sh, render_fn=render_fn)
    if not args.skip_test and scene.getTestCameras():
        render_set(dataset.model_path, "test", scene.loaded_iter,
                   scene.getTestCameras(), state, bg, cfg,
                   pipe.antialiasing, sh, render_fn=render_fn)
    if args.video or args.depth_video:
        render_video(dataset.model_path, scene.loaded_iter,
                     scene.getTrainCameras(), state, bg, cfg,
                     pipe.antialiasing, sh, fps=args.fps,
                     depth_video=args.depth_video, render_fn=render_fn)


if __name__ == "__main__":
    main()
