"""Debug snapshot facility — the TPU analogue of the CUDA rasterizer's
`debug` flag.

The reference rasterizer, when `pipe.debug` is set (armed from iteration N
by `--debug_from N`), wraps every kernel launch in CHECK_CUDA: on a CUDA
error it pickles the forward/backward inputs to `snapshot_fw/bw.dump` for
offline replay, then re-raises (`dgr_3dgs/__init__.py:17-19`
`cpu_deep_copy_tuple`, `rasterize_points.cu` CHECK_CUDA path;
`LGDWT-GS/train.py` arms it via `debug_from`).

On TPU there is no per-kernel recoverable error to hook — XLA executes a
fused program — so the observable failure class is a non-finite loss (the
same class `--detect_anomaly` traps eagerly, at ~2x step cost). When armed,
the loop validates each step's loss on the host and, on NaN/Inf, writes the
full replayable step input — model params, alive mask, densify stats, and
the step context (iteration, camera index, lrs, active SH degree) — to
`<model_path>/snapshot_fw.npz` before aborting. `load_snapshot` restores
the arrays for offline single-step repro.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np


def debug_active(pipe, it: int) -> bool:
    """Armed by `pipe.debug` outright or from `--debug_from N` onward."""
    if getattr(pipe, "debug", False):
        return True
    debug_from = int(getattr(pipe, "debug_from", -1))
    return 0 <= debug_from <= it


def dump_snapshot(path: str, state, meta: dict) -> str:
    """Write params/alive/densify-stats + JSON-encodable `meta` to npz."""
    arrays = {f"params.{k}": np.asarray(v) for k, v in state.params.items()}
    arrays["alive"] = np.asarray(state.alive)
    arrays["n_alive"] = np.asarray(state.n_alive)
    arrays["exposure"] = np.asarray(state.exposure)
    arrays["xyz_gradient_accum"] = np.asarray(state.xyz_gradient_accum)
    arrays["denom"] = np.asarray(state.denom)
    arrays["max_radii2d"] = np.asarray(state.max_radii2d)
    arrays["meta"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_snapshot(path: str):
    """→ (params dict, arrays dict incl. alive/stats, meta dict)."""
    with np.load(path) as z:
        params = {k[len("params."):]: z[k] for k in z.files
                  if k.startswith("params.")}
        arrays = {k: z[k] for k in z.files
                  if not k.startswith("params.") and k != "meta"}
        meta = json.loads(bytes(z["meta"]).decode())
    return params, arrays, meta


def check_step(pipe, it: int, metrics, state, model_path: str,
               context: dict | None = None) -> None:
    """Validate the step's loss when debugging is armed; on a non-finite
    value dump the replayable snapshot and abort loudly. No-op (and no
    device→host sync) when debugging is off."""
    if not debug_active(pipe, it):
        return
    loss = float(metrics["loss"])
    if math.isfinite(loss):
        return
    path = os.path.join(model_path or ".", "snapshot_fw.npz")
    meta = {"iteration": it, "loss": loss}
    meta.update({k: v for k, v in (context or {}).items()})
    dump_snapshot(path, state, meta)
    raise RuntimeError(
        f"[debug] non-finite loss ({loss}) at iteration {it}; step input "
        f"snapshot written to {path} — load with "
        f"sparse_view_3dgs_pack_tpu.train.debug.load_snapshot for offline "
        f"replay")
