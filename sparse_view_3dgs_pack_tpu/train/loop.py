"""Host training driver (reference `LGDWT-GS/train.py:48-292`).

The device does one XLA program per iteration (`train/step.py`); this loop
samples cameras without replacement, evaluates LR schedules, fires
densify/opacity-reset/SH-degree events, grows static capacity buckets on
overflow, logs, evaluates, and checkpoints.
"""

from __future__ import annotations

import os
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..models import gaussians as gm
from ..renderer import default_raster_config, render, render_core
from . import capacity
from . import debug
from ..utils.general import get_expon_lr_func
from ..utils.image import psnr as psnr_fn
from . import checkpoint as ckpt
from .densify import densify_and_prune, reset_opacity
from .optim import (init_adam, init_exposure_adam, make_exposure_schedule,
                    make_lr_schedules)
from .step import CameraBank, StepCarry, StepConfig, train_step


@dataclass
class TrainerEvents:
    """Host callbacks: (iteration, trainer) → None."""
    on_iteration: list = field(default_factory=list)


@partial(jax.jit, static_argnames=("width", "height", "sh_degree_active",
                                   "config", "antialiasing", "use_pallas"))
def _eval_view_metrics(params, alive, exposure_mat, cam, gt, width, height,
                       bg_color, sh_degree_active, config, antialiasing,
                       use_pallas):
    """Render one eval view and reduce to (psnr, l1, ssim) ON DEVICE — only
    scalars cross the host link (a full-image fetch + re-upload per view
    made evals minutes-long over the remote-TPU tunnel). SSIM matches the
    reference's in-training report (`FSGS/train.py:210-239` computes
    SSIM/LPIPS on test views; LGDWT reports L1/PSNR)."""
    from ..losses.ssim import ssim as ssim_fn
    res = render_core(params, alive, exposure_mat, cam, width, height,
                      bg_color, sh_degree_active, config,
                      antialiasing=antialiasing, use_pallas=use_pallas,
                      inference=True)
    return (psnr_fn(res.render, gt), jnp.mean(jnp.abs(res.render - gt)),
            ssim_fn(res.render, gt))


def evaluate_cameras(state, cameras, bg, active_sh, raster_cfg, use_pallas,
                     antialiasing=False, gt_fn=None, channels=3):
    """PSNR/L1/SSIM (+ real LPIPS when pretrained weights exist) over a
    camera list — the shared reduction behind `Trainer.evaluate` and the
    standalone loops' in-training reports (reference
    `FSGS/train.py:210-239`, `DNGaussian/train_llff.py:258-303`). All
    per-view metrics reduce ON DEVICE; only scalars cross the host link."""
    if not cameras:
        return {}
    if gt_fn is None:
        def gt_fn(cam):
            return jnp.asarray(cam.image[..., :channels], jnp.float32)
    # dispatch every view's on-device (psnr, l1, ssim) before fetching
    # any — the scalars pipeline behind each other's renders
    outs = [_eval_view_metrics(
                state.params, state.alive.astype(jnp.float32),
                state.exposure[0], cam.params(), gt_fn(cam),
                cam.width, cam.height, bg, active_sh, raster_cfg,
                antialiasing, use_pallas)
            for cam in cameras]
    stats = {"psnr": float(np.mean([float(p) for p, _, _ in outs])),
             "l1": float(np.mean([float(l) for _, l, _ in outs])),
             "ssim": float(np.mean([float(s) for _, _, s in outs])),
             "n_views": len(cameras)}
    # real LPIPS only when pretrained weights are present — the proxy
    # must never leak into an in-training "lpips" scalar
    from ..metrics.lpips import lpips_is_proxy
    if not lpips_is_proxy("vgg"):
        from ..metrics.lpips import lpips as lpips_fn
        vals = [lpips_fn(
                    render(state, cam, bg, sh_degree_active=active_sh,
                           config=raster_cfg).render, gt_fn(cam))
                for cam in cameras]
        stats["lpips"] = float(np.mean([float(v) for v in vals]))
    return stats


def format_eval(stats: dict) -> str:
    """One-line human report: `PSNR 21.13 SSIM 0.7421 [LPIPS 0.3120]`."""
    line = (f"PSNR {stats.get('psnr', 0):.2f}"
            f" SSIM {stats.get('ssim', 0):.4f}")
    if "lpips" in stats:
        line += f" LPIPS {stats['lpips']:.4f}"
    return line


def resolve_data_parallel(value) -> int:
    """CLI `--data_parallel`: 'auto' → every visible device, else int."""
    if value in (None, "", "off"):
        return 1
    if isinstance(value, str) and value.lower() == "auto":
        return len(jax.devices())
    return max(int(value), 1)


class Trainer:
    """Owns device state + schedules for the 3DGS/LGDWT family.

    `data_parallel` > 1 scales out over an ICI mesh (SURVEY §5.8/§7): each
    step renders `data_parallel` distinct views, one per device, against
    the replicated Gaussian set, and XLA psums the gradients
    (`parallel/dp.py`). Densify/opacity-reset events keep running host-side
    on the replicated state, identically on every replica."""

    def __init__(self, scene, opt, pipe, dataset_args, method="lgdwt",
                 quiet=False, data_parallel=1):
        self.scene = scene
        self.opt = opt
        self.pipe = pipe
        self.dataset_args = dataset_args
        self.method = method
        self.quiet = quiet

        self.dp_n = resolve_data_parallel(data_parallel)
        n_dev = len(jax.devices())
        if self.dp_n > n_dev:
            print(f"[dp] WARNING: --data_parallel {self.dp_n} > "
                  f"{n_dev} devices; clamping")
            self.dp_n = n_dev
        if self.dp_n > 1:
            from ..parallel.dp import make_mesh
            self.mesh = make_mesh(self.dp_n)
            if not quiet:
                print(f"[dp] data-parallel over {self.dp_n} devices "
                      f"({jax.devices()[0].platform})")
        else:
            self.mesh = None
        self._dp_step = None
        self._dp_clean = False

        cams = scene.getTrainCameras()
        self.width = cams[0].width
        self.height = cams[0].height
        self.channels = 3
        self.bank = CameraBank.from_cameras(cams, self.channels)

        self.state = scene.gaussians
        self.adam = init_adam(self.state.params)
        self.exp_adam = init_exposure_adam(self.state.exposure)
        self.carry = StepCarry(dwt_running_mean=jnp.ones(()))
        self.iteration = 0
        self.active_sh_degree = 0
        self.spatial_lr_scale = scene.cameras_extent

        self.lr_scheds = make_lr_schedules(opt, self.spatial_lr_scale)
        self.exposure_sched = make_exposure_schedule(opt)
        self.depth_weight_sched = get_expon_lr_func(
            opt.depth_l1_weight_init, opt.depth_l1_weight_final,
            max_steps=opt.iterations)

        self.background = jnp.asarray(
            [1.0, 1.0, 1.0] if dataset_args.white_background
            else [0.0, 0.0, 0.0], jnp.float32)[:self.channels]

        from .precompile import SpeculativeCompiler, speculation_enabled
        self.precompiler = SpeculativeCompiler(
            enabled=speculation_enabled(), quiet=quiet)
        self._shapes_dirty = True
        self._eval_gt_cache = {}

        self._raster_cfg = None
        self._cfg = None
        self._rebuild_config()

        self.viewpoint_stack = []
        self.events = TrainerEvents()
        self.pair_bucket = capacity.PairBucket(self._raster_cfg.max_pairs,
                                               quiet=self.quiet)
        self.pair_lag = capacity.LaggedScalar()

    # -------------------------------------------------------------- config
    def _rebuild_config(self):
        self._cfg = self._config_for(self.state.capacity)
        self._raster_cfg = self._cfg.raster
        # shapes changed → re-speculate on the next growth edges
        self._shapes_dirty = True
        # the raster config can change for reasons other than an overflow
        # (capacity growth with default sizing, checkpoint restore) — keep
        # the bucket controller in sync with the authoritative config
        if hasattr(self, "pair_bucket"):
            self.pair_bucket.max_pairs = self._raster_cfg.max_pairs
        if self.mesh is not None:
            from ..parallel.dp import build_dp_train_step
            self._dp_step = build_dp_train_step(self._cfg, self.mesh)

    def _config_for(self, capacity_: int,
                    max_pairs_: Optional[int] = None) -> StepConfig:
        """The StepConfig the loop would build at `capacity_` (and, when
        given, an explicit pair bucket) — pure w.r.t. trainer state, so the
        speculative compiler can predict post-growth configs exactly."""
        o = self.opt
        raster_cfg = default_raster_config(
            capacity_, self.width, self.height,
            max_pairs=(max_pairs_ if max_pairs_ is not None
                       else getattr(self.pipe, "max_pairs", 0)),
            max_per_tile=getattr(self.pipe, "max_per_tile", 0),
            tile_batch=getattr(self.pipe, "tile_batch", 64))
        use_pallas = getattr(self.pipe, "use_pallas", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        if os.environ.get("GS_FORCE_XLA_RASTER"):
            use_pallas = False
        return StepConfig(
            width=self.width, height=self.height, channels=self.channels,
            sh_degree=self.dataset_args.sh_degree, raster=raster_cfg,
            use_pallas=use_pallas,
            lambda_dssim=o.lambda_dssim,
            antialiasing=getattr(self.pipe, "antialiasing", False),
            train_test_exp=getattr(self.dataset_args, "train_test_exp", False),
            sparse_adam=(o.optimizer_type == "sparse_adam"),
            dwt_enable=getattr(o, "dwt_enable", False),
            dwt_weights=(getattr(o, "dwt_ll1_weight", 0.0),
                         getattr(o, "dwt_lh1_weight", 0.0),
                         getattr(o, "dwt_hl1_weight", 0.0),
                         getattr(o, "dwt_hh1_weight", 0.0),
                         getattr(o, "dwt_ll2_weight", 0.0),
                         getattr(o, "dwt_lh2_weight", 0.0),
                         getattr(o, "dwt_hl2_weight", 0.0),
                         getattr(o, "dwt_hh2_weight", 0.0)),
            patch_dwt_enable=getattr(o, "patch_dwt_enable", False),
            patch_dwt_weight=getattr(o, "patch_dwt_weight", 0.1),
            patch_size=getattr(o, "patch_size", 128),
            patch_percentile=getattr(o, "patch_percentile", 0.2),
            patch_dwt_lh1_weight=getattr(o, "patch_dwt_lh1_weight", 1.0),
            patch_dwt_hl1_weight=getattr(o, "patch_dwt_hl1_weight", 1.0),
        )

    def _precompile_next(self, lrs, bg):
        """Speculatively compile the train step for the deterministic growth
        edges (2× capacity, 2×/½ pair bucket) in a background thread, so the
        foreground re-jit at growth time hits the persistent compile cache
        (train/precompile.py). Single-device path only; best-effort."""
        if self.mesh is not None or not self.precompiler.enabled:
            return
        from . import precompile as pc
        others = pc.specs_of((self.exp_adam, self.carry, self.bank,
                              jnp.asarray(0, jnp.int32), lrs,
                              jnp.asarray(0.0, jnp.float32),
                              jnp.asarray(0.0, jnp.float32),
                              jnp.asarray(0, jnp.int32), bg))
        key_spec = pc.specs_of(jax.random.PRNGKey(0))
        use_pallas = getattr(self.pipe, "use_pallas", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        ecams = self.scene.getTestCameras() or self.scene.getTrainCameras()
        ecam = ecams[0] if ecams else None
        aa = getattr(self.pipe, "antialiasing", False)

        def lower_aux(s, a, c, n):
            """Densify + eval graphs recompile at the same shape edges as
            the train step (measured 40-150 s stalls each on the remote
            TPU); best-effort — a failure only loses the head start."""
            for mss in (0, 20):
                densify_and_prune.lower(
                    s, a, key_spec, self.opt.densify_grad_threshold, 0.005,
                    self.scene.cameras_extent, max_screen_size=mss,
                    percent_dense=self.opt.percent_dense).compile()
            if ecam is not None:
                alive_spec = jax.ShapeDtypeStruct((n,), jnp.float32)
                gt_spec = jax.ShapeDtypeStruct(
                    (ecam.height, ecam.width, self.channels), jnp.float32)
                # active degree saturates at the max by iter 3000; compile
                # both the current and the final degree's eval graphs
                for deg in {self.active_sh_degree,
                            self.dataset_args.sh_degree}:
                    _eval_view_metrics.lower(
                        s.params, alive_spec,
                        pc.specs_of(self.state.exposure[0]),
                        pc.specs_of(ecam.params()), gt_spec,
                        ecam.width, ecam.height,
                        pc.specs_of(self.background), deg, c.raster,
                        aa, use_pallas).compile()

        def lower_with(s, a, c, n):
            train_step.lower(s, a, *others, c).compile()
            lower_aux(s, a, c, n)

        pc.speculate_growth_edges(
            self.precompiler, self.state, self.adam,
            self._raster_cfg.max_pairs, capacity.PAIR_HARD_CAP,
            cfg_for=self._config_for,
            lower_with=lower_with,
            mark_current=(self.state.capacity, self._cfg))
        # the CURRENT shape's train step just compiled in the foreground,
        # but its densify/eval graphs have not — warm them too (the first
        # eval otherwise compiles cold at its test iteration)
        cap_now = self.state.capacity
        s0, a0 = pc.specs_of((self.state, self.adam))
        self.precompiler.submit(
            ("aux", cap_now, self._cfg, self.active_sh_degree),
            lambda s=s0, a=a0, c=self._cfg, n=cap_now: lower_aux(s, a, c, n),
            label=f"aux capacity={cap_now}")

    def _maybe_grow(self):
        """Grow parameter capacity (Adam moments padded) when close to
        full; shared semantics live in `train/capacity.py`."""
        self.state, self.adam, grew = capacity.ensure_headroom(
            self.state, self.adam, quiet=self.quiet)
        if grew:
            self._dp_clean = False
            self._rebuild_config()

    def _maybe_grow_pairs(self, n_pairs: int):
        """Grow/shrink the pair bucket — or, on the per-tile clip sentinel,
        the max_per_tile knob — via the shared router (capacity.pair_signal)."""
        if capacity.pair_signal(n_pairs, self.pair_bucket, self.pipe,
                                self._raster_cfg.max_per_tile):
            self.pipe.max_pairs = self.pair_bucket.max_pairs
            self._rebuild_config()

    # ------------------------------------------------------------------ dp
    def _dp_replicate(self):
        """Pin state onto the mesh (replicated) after any host-side
        mutation (init, densify, reset, growth, restore)."""
        from ..parallel.dp import replicate
        self.state = replicate(self.state, self.mesh)
        self.adam = replicate(self.adam, self.mesh)
        self.exp_adam = replicate(self.exp_adam, self.mesh)
        self.carry = replicate(self.carry, self.mesh)
        self._dp_clean = True

    def _dp_substep(self, it, lrs, bg):
        """One data-parallel step: dp_n distinct views, one per device."""
        from ..parallel.dp import ViewBatch, shard_batch
        idxs = [self.pick_camera() for _ in range(self.dp_n)]
        batch = shard_batch(ViewBatch.gather(self.bank, idxs), self.mesh)
        if not self._dp_clean:
            self._dp_replicate()
        with self.mesh:
            (self.state, self.adam, self.exp_adam, self.carry,
             metrics) = self._dp_step(
                self.state, self.adam, self.exp_adam, self.carry, batch,
                lrs, jnp.asarray(self.exposure_sched(it), jnp.float32),
                jnp.asarray(self.depth_weight_sched(it), jnp.float32),
                jnp.asarray(self.active_sh_degree, jnp.int32), bg)
        return metrics

    # -------------------------------------------------------------- viewer
    def serve_viewer(self):
        """Poll the SIBR remote-viewer socket once (reference polls every
        iteration, `LGDWT-GS/train.py:82-95`). No-op when no listener."""
        from ..viewer import network_gui
        if network_gui.listener is None:
            return

        def render_fn(cam, scaling_modifier):
            res = render(self.state, cam, self.background,
                         sh_degree_active=self.active_sh_degree,
                         scaling_modifier=float(scaling_modifier),
                         config=None if (cam.width != self.width or
                                         cam.height != self.height)
                         else self._raster_cfg)
            return res.render

        network_gui.serve_once(render_fn,
                               self.dataset_args.source_path)

    # ---------------------------------------------------------------- step
    def pick_camera(self) -> int:
        if not self.viewpoint_stack:
            self.viewpoint_stack = list(range(len(self.scene.getTrainCameras())))
        idx = self.viewpoint_stack.pop(
            random.randint(0, len(self.viewpoint_stack) - 1))
        return idx

    def step(self) -> dict:
        self.iteration += 1
        it = self.iteration
        o = self.opt
        self.serve_viewer()

        if it % 1000 == 0 and self.active_sh_degree < self.dataset_args.sh_degree:
            self.active_sh_degree += 1

        lrs = {k: jnp.asarray(f(it), jnp.float32)
               for k, f in self.lr_scheds.items()
               if k in self.state.params}
        bg = (jnp.asarray(np.random.random(self.channels), jnp.float32)
              if getattr(o, "random_background", False) else self.background)

        if self.mesh is None:
            cam_idx = self.pick_camera()
            out = train_step(
                self.state, self.adam, self.exp_adam, self.carry, self.bank,
                jnp.asarray(cam_idx, jnp.int32), lrs,
                jnp.asarray(self.exposure_sched(it), jnp.float32),
                jnp.asarray(self.depth_weight_sched(it), jnp.float32),
                jnp.asarray(self.active_sh_degree, jnp.int32), bg, self._cfg)
            self.state, self.adam = out.state, out.adam
            self.exp_adam, self.carry = out.exp_adam, out.carry
            metrics = out.metrics
            if self._shapes_dirty:
                # the step above just (re)compiled the current shape; hand
                # the NEXT growth edges to the background compiler now
                self._shapes_dirty = False
                self._precompile_next(lrs, bg)
        else:
            cam_idx = None
            metrics = self._dp_substep(it, lrs, bg)

        # debug snapshot on non-finite loss (reference CHECK_CUDA dump path)
        debug.check_step(self.pipe, it, metrics, self.state,
                         getattr(self.dataset_args, "model_path", "."),
                         {"cam_idx": cam_idx,
                          "active_sh_degree": self.active_sh_degree})

        # densification events (reference train.py:265-276)
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                self._maybe_grow()
                size_thr = 20 if it > o.opacity_reset_interval else 0
                res = densify_and_prune(
                    self.state, self.adam,
                    jax.random.PRNGKey(it),
                    o.densify_grad_threshold, 0.005,
                    self.scene.cameras_extent, max_screen_size=size_thr,
                    percent_dense=o.percent_dense)
                self.state, self.adam = res.state, res.opt_state
                self._dp_clean = False
                if capacity.dropped_appends(res, it, self.state.capacity):
                    # unconditional: a drop means the event ran out of room
                    # even if pruning left the final count under the
                    # headroom threshold
                    self.state, self.adam = capacity.grow_state(
                        self.state, self.adam, quiet=self.quiet)
                    self._rebuild_config()
            if (it % o.opacity_reset_interval == 0
                    or (self.dataset_args.white_background
                        and it == o.densify_from_iter)):
                self.state, self.adam = reset_opacity(self.state, self.adam)
                self._dp_clean = False

        # pair-bucket overflow drops tail pairs (subtly wrong renders).
        # Check EVERY iteration via a one-step-lagged readback: the previous
        # step's n_pairs resolves behind the step just dispatched, so no
        # async-dispatch stall, and a jump (camera change, densify) grows
        # the bucket within one step instead of up to 9 stale ones.
        prev_pairs = self.pair_lag.swap(metrics["n_pairs"])
        if prev_pairs is not None:
            self._maybe_grow_pairs(prev_pairs)

        for cb in self.events.on_iteration:
            cb(it, self, metrics)
        return metrics

    # ------------------------------------------------------------- eval/IO
    def _eval_gt(self, cam):
        """Ground-truth image on device, cached — mid-training evals repeat
        over the same test views, and re-uploading HxWx3 f32 per view per
        eval dominated eval time on the remote TPU (57-160 s per eval in
        the round-3 30k run; ~2 s with the cache + on-device metrics)."""
        key = id(cam)
        gt = self._eval_gt_cache.get(key)
        if gt is None:
            if len(self._eval_gt_cache) >= 128:   # bound device memory
                self._eval_gt_cache.clear()
            gt = jax.device_put(
                jnp.asarray(cam.image[..., :self.channels], jnp.float32))
            self._eval_gt_cache[key] = gt
        return gt

    def evaluate(self, cameras, max_views: Optional[int] = None) -> dict:
        if max_views:
            cameras = cameras[:max_views]
        if not cameras:
            return {}
        use_pallas = getattr(self.pipe, "use_pallas", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        return evaluate_cameras(
            self.state, cameras, self.background, self.active_sh_degree,
            self._raster_cfg, use_pallas,
            antialiasing=getattr(self.pipe, "antialiasing", False),
            gt_fn=self._eval_gt)

    def save_scene(self, iteration: int):
        self.scene.gaussians = self.state
        self.scene.save(iteration)

    def save_checkpoint(self, path: str):
        ckpt.save_checkpoint(path, self.state, self.adam, self.exp_adam,
                             self.carry, self.iteration)

    def restore_checkpoint(self, path: str):
        (self.state, self.adam, self.exp_adam, self.carry,
         self.iteration) = ckpt.load_checkpoint(path)
        self._dp_clean = False
        self.active_sh_degree = min(self.iteration // 1000,
                                    self.dataset_args.sh_degree)
        self._rebuild_config()


def simple_train(scene, opt, pipe, dataset_args, method="lgdwt",
                 testing_iterations=(), saving_iterations=(),
                 checkpoint_iterations=(), quiet=False,
                 progress: Optional[Callable] = None,
                 start_checkpoint: Optional[str] = None,
                 tb: bool = True, data_parallel=1):
    from .logging import TrainReporter

    trainer = Trainer(scene, opt, pipe, dataset_args, method, quiet=quiet,
                      data_parallel=data_parallel)
    if start_checkpoint:
        trainer.restore_checkpoint(start_checkpoint)
        print(f"Resumed from {start_checkpoint} "
              f"(iteration {trainer.iteration})")
    reporter = TrainReporter(scene.model_path, enabled=tb)
    t0 = time.time()
    last = t0
    for it in range(trainer.iteration + 1, opt.iterations + 1):
        metrics = trainer.step()
        if progress and it % 10 == 0:
            progress(it, metrics)
        if it % 10 == 0:
            now = time.time()
            reporter.scalars(it, metrics)
            reporter.iter_time(it, (now - last) / 10)
            last = now
        if it in testing_iterations:
            stats = trainer.evaluate(scene.getTestCameras() or
                                     scene.getTrainCameras()[:4])
            print(f"\n[ITER {it}] Evaluating: {format_eval(stats)}")
            if reporter.writer is not None and getattr(opt, "dwt_enable",
                                                       False):
                # WEF heatmaps for the first eval view (reference TB hooks)
                cam0 = (scene.getTestCameras() or scene.getTrainCameras())[0]
                from ..renderer import render as _render
                res = _render(trainer.state, cam0, trainer.background,
                              sh_degree_active=trainer.active_sh_degree,
                              config=trainer._raster_cfg)
                reporter.wef_heatmaps(it, res.render,
                                      jnp.asarray(cam0.image[..., :3]))
            if reporter.writer is not None:
                reporter.writer.add_scalar("test/psnr",
                                           stats.get("psnr", 0.0), it)
                reporter.writer.add_scalar("test/ssim",
                                           stats.get("ssim", 0.0), it)
                if "lpips" in stats:
                    reporter.writer.add_scalar("test/lpips",
                                               stats["lpips"], it)
                reporter.histogram(it, "scene/opacity_histogram",
                                   np.asarray(gm.get_opacity(trainer.state)))
                reporter.writer.add_scalar("scene/total_points",
                                           int(trainer.state.n_alive), it)
        if it in saving_iterations:
            print(f"\n[ITER {it}] Saving Gaussians")
            trainer.save_scene(it)
        if it in checkpoint_iterations:
            print(f"\n[ITER {it}] Saving Checkpoint")
            trainer.save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{it}.npz"))
    reporter.close()
    elapsed = time.time() - t0
    return trainer, elapsed
