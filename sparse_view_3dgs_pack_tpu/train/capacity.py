"""Shared capacity / pair-bucket management for ALL training loops.

The reference resizes parameter and optimizer tensors exactly on every
densify event (`LGDWT-GS/scene/gaussian_model.py:316-407`), so nothing is
ever silently dropped. Under XLA all shapes are static; this module is the
padded-capacity equivalent, shared by the 3dgs/lgdwt `Trainer`, the FSGS,
DNGaussian, and NIR loops:

* doubling parameter-capacity growth with zero-padded Adam moments,
* loud warnings + immediate growth when a densify event dropped appends,
* a grow/shrink controller for the rasterizer pair bucket (overflow drops
  tail pairs — subtly wrong renders — so it must be detected and grown).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import gaussians as gm

GROW_FRACTION = 0.85        # grow when alive exceeds this share of capacity
PAIR_HARD_CAP = 1 << 23     # beyond this, transient blow-ups drop tail pairs
PAIR_SHRINK_STREAK = 50     # consecutive oversize checks before shrinking
                            # (checks run once per iteration via LaggedScalar
                            # → ~50 iterations of sustained 3x headroom)


def pad_moment(a, target):
    """Zero-pad one Adam moment along axis 0 to a freshly-grown capacity."""
    if a.shape == target.shape:
        return a
    pads = [(0, target.shape[0] - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pads)


def pad_adam(adam, params):
    """Adam moments survive a capacity grow, zero-padded to match."""
    return adam._replace(
        m={k: pad_moment(a, params[k]) for k, a in adam.m.items()},
        v={k: pad_moment(a, params[k]) for k, a in adam.v.items()})


def grow_state(state, adam, quiet=False):
    """Double parameter capacity and pad the optimizer state to match."""
    state = gm.grow_capacity(state, state.capacity * 2)
    adam = pad_adam(adam, state.params)
    if not quiet:
        print(f"[capacity] grown to {state.capacity}")
    return state, adam


def ensure_headroom(state, adam, quiet=False):
    """Grow when the alive count is close to capacity.

    Returns (state, adam, grew). Call before each densify event so the
    event has room for its appends (reference semantics: exact realloc,
    `gaussian_model.py:316-407`).
    """
    if int(state.n_alive) > GROW_FRACTION * state.capacity:
        state, adam = grow_state(state, adam, quiet=quiet)
        return state, adam, True
    return state, adam, False


def dropped_appends(res, it, capacity, quiet=False) -> bool:
    """True when a densify event dropped appends at capacity.

    The caller must grow immediately — silence here is the failure mode the
    reference cannot have (it reallocates exactly per event).
    """
    req, app = int(res.requested), int(res.appended)
    if req <= app:
        return False
    if not quiet:
        print(f"[densify] WARNING iter {it}: {req - app} of {req} appends "
              f"dropped at capacity {capacity}; growing now")
    return True


class LaggedScalar:
    """One-step-delayed host readback of a per-step device scalar.

    Fetching a step metric synchronously every iteration would stall async
    dispatch (the host would block on the step it just enqueued). Instead
    the loop hands each step's unfetched device scalar to `swap`, which
    returns the PREVIOUS step's value — by then the device has already
    retired (or is retiring) that step behind the newly dispatched one, so
    the host blocks only on completed work and the dispatch pipeline keeps
    a depth of one. Used for per-iteration pair-overflow detection: an
    overflow at step i grows the bucket before step i+2, vs up to 9 stale
    steps under the old every-10-iterations sampling.
    """

    def __init__(self):
        self._pending = None

    def swap(self, value):
        """Stash this step's scalar; return last step's as int (or None)."""
        prev, self._pending = self._pending, value
        return None if prev is None else int(prev)

    def flush(self):
        """Resolve the stashed scalar without replacing it (end of loop)."""
        prev, self._pending = self._pending, None
        return None if prev is None else int(prev)


def pair_signal(n_pairs: int, pair_bucket: "PairBucket", pipe,
                max_per_tile: int) -> bool:
    """Route a step's n_pairs readback to the right growth knob.

    `n_pairs == max_pairs + 1` EXACTLY is render_core's per-tile clip
    sentinel (XLA path): the bucket has room but a tile's list exceeded
    max_per_tile — double `pipe.max_per_tile` (growing the bucket can
    never unclip a tile; observed: a 67k-pair 128px frame ran the bucket
    to the 8M hard cap). Anything else goes to the bucket controller.
    Returns True when the caller must rebuild its raster config."""
    if n_pairs == pair_bucket.max_pairs + 1:
        pipe.max_per_tile = 2 * max_per_tile
        print(f"[raster] per-tile list grown to {pipe.max_per_tile}")
        return True
    return pair_bucket.update(n_pairs) is not None


class PairBucket:
    """Host-side controller for the rasterizer's max_pairs bucket.

    Grows on overflow (with 30% headroom, rounded to a power of two, capped
    at PAIR_HARD_CAP) and shrinks after PAIR_SHRINK_STREAK consecutive
    checks with 3x headroom — every binning/pack cost scales with the
    bucket, so both directions matter. `update(n_pairs)` returns the new
    max_pairs when the caller must rebuild its raster config, else None.
    """

    def __init__(self, max_pairs: int, hard_cap: int = PAIR_HARD_CAP,
                 quiet: bool = False):
        self.max_pairs = int(max_pairs)
        self.hard_cap = hard_cap
        self.quiet = quiet
        self._shrink_streak = 0

    def update(self, n_pairs: int):
        if n_pairs > self.max_pairs:
            self._shrink_streak = 0
            new = self.max_pairs
            while new < n_pairs * 1.3:
                new *= 2
            if new > self.hard_cap:
                # transient exploding gaussians can touch every tile
                # (pairs ≈ P·num_tiles); beyond the cap the farthest-tile
                # tail drops for a few iterations instead of risking OOM,
                # and size screening prunes the offenders soon after
                print(f"[raster] WARNING: pair demand {n_pairs} exceeds "
                      f"the {self.hard_cap} bucket cap; tail pairs drop "
                      "until oversized gaussians are pruned")
                new = self.hard_cap
            if new == self.max_pairs:
                return None
            self.max_pairs = new
            if not self.quiet:
                print(f"[raster] pair bucket grown to {new}")
            return new
        if n_pairs * 3 < self.max_pairs and self.max_pairs > (1 << 16):
            self._shrink_streak += 1
            if self._shrink_streak >= PAIR_SHRINK_STREAK:
                self.max_pairs //= 2
                self._shrink_streak = 0
                if not self.quiet:
                    print(f"[raster] pair bucket shrunk to {self.max_pairs}")
                return self.max_pairs
        else:
            self._shrink_streak = 0
        return None
