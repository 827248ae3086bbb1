#!/usr/bin/env python3
"""Headline benchmark on real TPU hardware.

Prints ONE JSON line:
  {"metric": "render_fps_1080p", "value": N, "unit": "fps",
   "vs_baseline": N/30, ...extras}

Baseline anchor: the 3DGS paper's ">= 30 fps at 1080p" real-time claim on an
RTX-class GPU (reference `gaussian-splatting/README.md:14`) and a consumer-
GPU training rate of ~15 it/s for the 30k-iteration schedule. Scenes are
synthetic (no datasets ship with the repo): a 200k-Gaussian cloud with
mid-training-like scale statistics.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TRAIN_BASELINE_ITS = 15.0   # consumer-GPU 3DGS-like it/s anchor
RENDER_BASELINE_FPS = 30.0  # paper claim @1080p


def build_scene(n=200_000, seed=0, extent=2.5, scale=(0.004, 0.02)):
    from sparse_view_3dgs_pack_tpu import testing
    cloud = testing.make_gaussian_cloud(seed, n, extent=extent,
                                        scale_range=scale, sh_degree=0)
    return cloud


def bench_render(width=1920, height=1080, n=200_000, frames=10):
    import jax
    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu.data.cameras import CameraParams
    from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
    from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
        make_pallas_rasterizer
    from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
    from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras

    cloud = build_scene(n)
    cams = make_orbit_cameras(4 * frames, radius=6.0, width=width,
                              height_px=height)
    # 32x16 inference tiles (matches render_core's inference path): ~30%
    # fewer pairs than 16x16 (0.72M real at 1080p) + half the tile programs
    tile_x, tile_y = 32, 16

    params = {
        "xyz": jnp.asarray(cloud["xyz"]),
        "scales": jnp.exp(jnp.asarray(cloud["scales"])),
        "quats": jnp.asarray(cloud["quats"]),
        "opac": jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        "sh": jnp.asarray(cloud["features"]),
    }

    # right-size the pair bucket for this scene: every binning/pack/sort
    # pass scales with it. Same policy as the training loop (grow on
    # overflow, shrink oversized) applied up-front via the exact pair count.
    from sparse_view_3dgs_pack_tpu.ops.binning import count_pairs

    def pairs_of(viewmat, full_proj, cam_center, tanx, tany):
        proj = project_gaussians(
            means3d=params["xyz"], scales=params["scales"],
            quats=params["quats"], opacities=params["opac"],
            viewmat=viewmat, full_proj=full_proj, cam_center=cam_center,
            tan_fovx=tanx, tan_fovy=tany, width=width, height=height,
            sh=params["sh"], sh_degree=0)
        return count_pairs(proj.means2d, proj.depths, proj.rect_radii,
                           width, height, tile_x, tile_y)

    jp = jax.jit(pairs_of)
    worst = max(int(jp(jnp.asarray(c.params().viewmat),
                       jnp.asarray(c.params().full_proj),
                       jnp.asarray(c.params().cam_center),
                       jnp.asarray(c.params().tan_fovx),
                       jnp.asarray(c.params().tan_fovy)))
                for c in cams)
    max_pairs = ((int(worst * 1.06) + 127) // 128) * 128

    raster_fn = make_pallas_rasterizer(width, height, 3, inference=True,
                                       tile_x=tile_x, tile_y=tile_y)

    def render_frame(p, viewmat, full_proj, cam_center, tanx, tany):
        proj = project_gaussians(
            means3d=p["xyz"], scales=p["scales"], quats=p["quats"],
            opacities=p["opac"], viewmat=viewmat, full_proj=full_proj,
            cam_center=cam_center, tan_fovx=tanx, tan_fovy=tany,
            width=width, height=height, sh=p["sh"], sh_degree=0)
        ba = bin_gaussians(proj.means2d, proj.depths, proj.rect_radii,
                           width, height, max_pairs, tile_x, tile_y)
        color, _, _, _ = raster_fn(proj.means2d, proj.depths, proj.conics,
                                   proj.colors, proj.opacities, ba.ids,
                                   ba.tile_starts, ba.tile_counts,
                                   jnp.zeros(3))
        return color

    jfn = jax.jit(render_frame)
    camps = [c.params() for c in cams]

    def args(i):
        p = camps[i % len(camps)]
        return (jnp.asarray(p.viewmat), jnp.asarray(p.full_proj),
                jnp.asarray(p.cam_center), jnp.asarray(p.tan_fovx),
                jnp.asarray(p.tan_fovy))

    out = jfn(params, *args(0))
    _ = np.asarray(out[0, 0])  # block_until_ready does not sync this backend
    # the remote-TPU tunnel has high latency variance; take the best trial
    # of several, each over distinct cameras (identical requests are deduped
    # by the transport and must not be timed)
    best = float("inf")
    for trial in range(4):
        t0 = time.perf_counter()
        for i in range(frames):
            out = jfn(params, *args(trial * frames + i))
        _ = np.asarray(out[0, 0])  # materialize → true completion
        best = min(best, (time.perf_counter() - t0) / frames)
    return 1.0 / best


def bench_train(width=800, height=800, n=100_000, iters=10):
    import jax
    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu.models import gaussians as gm
    from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig
    from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras
    from sparse_view_3dgs_pack_tpu.train.optim import (init_adam,
                                                       init_exposure_adam)
    from sparse_view_3dgs_pack_tpu.train.step import (CameraBank, StepCarry,
                                                      StepConfig, train_step)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    state = gm.create_from_pcd(pts, cols, n_images=4, sh_degree=3)

    cams = make_orbit_cameras(4, radius=6.0, width=width, height_px=height)
    for c in cams:
        c.image = rng.random((height, width, 3)).astype(np.float32)
        c.alpha_mask = np.ones((height, width), np.float32)
    bank = CameraBank.from_cameras(cams)

    import jax as _jax
    cfg = StepConfig(
        width=width, height=height, sh_degree=3,
        raster=RasterConfig(max_pairs=1 << 19, max_per_tile=1024,
                            tile_batch=128),
        use_pallas=_jax.default_backend() not in ("cpu",),
        dwt_enable=True, patch_dwt_enable=True, patch_size=128)

    adam = init_adam(state.params)
    exp_adam = init_exposure_adam(state.exposure)
    carry = StepCarry(dwt_running_mean=jnp.ones(()))
    lrs = {k: jnp.asarray(1e-3) for k in state.params}

    def one(i, state, adam, exp_adam, carry):
        return train_step(state, adam, exp_adam, carry, bank,
                          jnp.asarray(i % 4, jnp.int32), lrs,
                          jnp.asarray(0.0), jnp.asarray(0.0),
                          jnp.asarray(3, jnp.int32), jnp.zeros(3), cfg)

    out = one(0, state, adam, exp_adam, carry)
    _ = np.asarray(out.state.params["xyz"][0, 0])
    state, adam, exp_adam, carry = (out.state, out.adam, out.exp_adam,
                                    out.carry)
    # params evolve every step, so every request is distinct; best-of-trials
    # filters transport stalls
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            out = one(i, state, adam, exp_adam, carry)
            state, adam, exp_adam, carry = (out.state, out.adam,
                                            out.exp_adam, out.carry)
        _ = np.asarray(state.params["xyz"][0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return 1.0 / best


def _probe():
    """Touch the backend and materialise one array (tunnel round-trip)."""
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    np.asarray(jnp.ones((8, 128)) * 2.0)
    return 1.0 if dev is not None else 0.0


PHASES = {"render": lambda: bench_render(), "train": lambda: bench_train(),
          "probe": _probe}


def _run_phase_child(phase):
    """Child mode: run one bench phase and print {"value": N} on success."""
    # persistent XLA cache: TPU compiles in this environment run 30-300+ s
    # per program; a warm cache (pre-seeded by any earlier run of the same
    # code) turns every retry/re-run into seconds. No-op on CPU.
    from sparse_view_3dgs_pack_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    value = PHASES[phase]()
    print(json.dumps({"value": value, "device": _device_name()}))


_seen_device = "unknown"


def _run_phase(phase, attempts=4, timeout=1500):
    """Run one bench phase in a fresh subprocess, retrying on failure.

    The TPU backend occasionally throws a transient INTERNAL error at the
    very first device touch (observed in BENCH_r02: a single unprotected
    attempt erased the round's perf record). A fresh process recovers —
    same defence `__graft_entry__.dryrun_multichip` uses. Returns the
    phase's float value, or None if every attempt failed.
    """
    import subprocess

    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", phase],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"[bench] {phase} attempt {attempt + 1}: "
                             f"timed out after {timeout}s\n")
            continue
        if proc.returncode == 0:
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    payload = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if isinstance(payload, dict) and "value" in payload:
                    global _seen_device
                    _seen_device = payload.get("device", _seen_device)
                    return float(payload["value"])
        sys.stderr.write(
            f"[bench] {phase} attempt {attempt + 1}/{attempts} failed "
            f"(rc={proc.returncode}); stderr tail:\n{proc.stderr[-2000:]}\n")
        time.sleep(3.0 * (attempt + 1))
    return None


REGRESSION_TOLERANCE = 0.10   # fail the bench on a >10% drop vs last round


def _previous_round_numbers():
    """(render_fps, train_its) from the newest BENCH_r*.json with real
    values, or (None, None). The driver writes one per round — comparing
    against it turns the bench into a regression gate: a silent perf drop
    >10% exits nonzero instead of passing quietly (VERDICT r3 weak #6)."""
    import glob
    import re

    best_round, prev = -1, None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                payload = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(payload, dict):
            continue
        # the driver wraps the JSON line under "parsed" (rc/cmd/tail siblings)
        result = payload.get("parsed") or payload.get("result") or payload
        if not isinstance(result, dict) or result.get("value") is None:
            continue
        if int(m.group(1)) > best_round:
            best_round, prev = int(m.group(1)), result
    if prev is None:
        return None, None
    return prev.get("value"), prev.get("train_iters_per_sec_800p")


def _regressed(render_fps, train_its):
    """True when either metric dropped >REGRESSION_TOLERANCE vs the last
    recorded round (missing current values are handled by the caller)."""
    prev_fps, prev_its = _previous_round_numbers()
    bad = False
    for name, now, ref in (("render_fps_1080p", render_fps, prev_fps),
                           ("train_its_800p", train_its, prev_its)):
        if now is None or ref is None:
            continue
        if now < ref * (1.0 - REGRESSION_TOLERANCE):
            sys.stderr.write(
                f"[bench] REGRESSION: {name} {now:.2f} is more than "
                f"{REGRESSION_TOLERANCE:.0%} below the previous round's "
                f"{ref:.2f}\n")
            bad = True
    return bad


def main():
    # Fast pre-flight: with a wedged TPU tunnel, backend init HANGS rather
    # than erroring, and each phase attempt would burn its full timeout —
    # hours before the driver sees any JSON. Probe first with a short
    # budget and fail out in minutes instead. (Observed: the axon relay's
    # claim leg hung for 3+ hours straight; nothing recovers it in-process.)
    # Observed flakiness modes: (a) cold-compile slowness (covered by the
    # persistent cache), (b) intermittent claim hangs where a fresh process
    # succeeds on retry — so prefer MORE, SHORTER probe attempts: a healthy
    # tunnel answers in <60 s; a hung attempt never returns at any budget.
    if _run_phase("probe", attempts=4, timeout=240) is None:
        sys.stderr.write("[bench] backend unreachable (probe failed twice); "
                         "emitting null result\n")
        render_fps = train_its = None
    else:
        render_fps = _run_phase("render")
        train_its = _run_phase("train")
    result = {
        "metric": "render_fps_1080p",
        "value": round(render_fps, 2) if render_fps is not None else None,
        "unit": "fps",
        "vs_baseline": (round(render_fps / RENDER_BASELINE_FPS, 3)
                        if render_fps is not None else None),
        "train_iters_per_sec_800p": (round(train_its, 2)
                                     if train_its is not None else None),
        "train_vs_baseline": (round(train_its / TRAIN_BASELINE_ITS, 3)
                              if train_its is not None else None),
        # reported by the successful child — the PARENT never initialises
        # the backend: with a wedged TPU tunnel jax.devices() can hang
        # indefinitely, and the parent has no timeout around itself
        "device": _seen_device,
        # anchors are literature constants, not locally measured (no CUDA
        # GPU exists here): >=30 fps @1080p is the 3DGS paper's real-time
        # claim (gaussian-splatting/README.md:14, RTX-class); ~15 it/s is a
        # consumer-GPU 30k-schedule training rate
        "baseline_src": "3dgs-paper-30fps-1080p;consumer-gpu-15its",
    }
    print(json.dumps(result))
    # green requires BOTH phases to produce a number AND neither to have
    # regressed >10% vs the previous round's recorded BENCH json
    if render_fps is None or train_its is None:
        return 1
    return 1 if _regressed(render_fps, train_its) else 0


def _device_name():
    import jax
    try:
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        _run_phase_child(sys.argv[2])
        sys.exit(0)
    sys.exit(main())
