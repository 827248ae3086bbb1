"""General helpers: LR schedules, quaternion→rotation, seeding, misc.

Mirrors the behaviour of the reference `utils/general_utils.py` /
`utils/system_utils.py` (log-lerp LR with warm-up delay `general_utils.py:61`,
`build_rotation`, `safe_state` stdout timestamping + seeding `:113`,
`searchForMaxIteration`), re-expressed functionally for JAX.
"""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0,
                      lr_delay_mult=1.0, max_steps=1000000):
    """Continuous log-lerp LR schedule with optional sine warm-up delay.

    Same semantics as the reference scheduler: returns 0 when either endpoint
    LR is 0 (disabled group); clamps step to [0, max_steps].
    Works with python ints or traced values.
    """

    def helper(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if lr_init == lr_final == 0.0 or (lr_init == 0.0 and lr_final == 0.0):
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        out = delay_rate * log_lerp
        # disabled group (either endpoint exactly 0) → always 0
        if lr_init == 0.0 or lr_final == 0.0:
            out = jnp.zeros_like(out)
        return out

    return helper


def build_rotation(q):
    """Unit-normalised quaternion (w, x, y, z) → rotation matrix. q: (..., 4).

    The +1e-24 inside the sqrt keeps the GRADIENT finite at q=0 (sqrt' is
    infinite there; a zero-padded dead slot would turn its zero cotangent
    into NaN via 0·inf). Invisible for unit-scale quaternions."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    q = q / jnp.maximum(norm, 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return R


def build_scaling_rotation(s, q):
    """diag(s) pre-rotated: L = R @ diag(s); covariance = L @ L^T."""
    R = build_rotation(q)
    return R * s[..., None, :]


def strip_lowerdiag(cov):
    """(..., 3, 3) symmetric → (..., 6) upper-triangular packing (3DGS order)."""
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


class _TimestampedStdout:
    def __init__(self, wrapped, silent):
        self._wrapped = wrapped
        self._silent = silent

    def write(self, x):
        if self._silent:
            return
        if x.endswith("\n"):
            x = x[:-1].replace("\n", "\n[{}]".format(
                datetime.now().strftime("%d/%m %H:%M:%S")))
            self._wrapped.write(
                "{} [{}]\n".format(x, datetime.now().strftime("%d/%m %H:%M:%S")))
        else:
            self._wrapped.write(x)

    def flush(self):
        self._wrapped.flush()

    def __getattr__(self, name):
        return getattr(self._wrapped, name)


def safe_state(silent: bool = False, seed: int = 0):
    """Seed host RNGs and timestamp stdout lines (reference `general_utils.py:113`).

    Device RNG in this framework is explicit `jax.random` keys; this seeds the
    host-side numpy/random used for camera sampling order.
    """
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
    return seed


def searchForMaxIteration(folder: str):
    """Max N over `iteration_N` subdirs (reference `system_utils.py`)."""
    if not os.path.isdir(folder):
        return None
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)
             if f.startswith("iteration_") and f.split("_")[-1].isdigit()]
    return max(saved) if saved else None


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)
