#!/usr/bin/env python3
"""Measure the vjp reduction candidates: scatter-add segment_sum vs
sorted-order cumsum-boundary reduction, at real sizes (6.3M pairs, 100k
gaussians, 14 rows)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

P = 100_000
NBUF = (1 << 21) + 256 * 2500   # aligned buffer size at 800p
rng = np.random.default_rng(0)
ids_np = rng.integers(0, P, NBUF).astype(np.int32)
ids_np[rng.random(NBUF) < 0.7] = -1   # most slots are padding at this load
ids = jnp.asarray(ids_np)
d_list = [jax.random.normal(jax.random.PRNGKey(i), (14, NBUF)) * 1e-3
          for i in range(4)]
jax.block_until_ready(d_list)

@jax.jit
def via_segment_sum(d):
    valid = ids >= 0
    seg = jnp.where(valid, ids, P)
    contrib = jnp.where(valid[None], d, 0.0)
    return jax.ops.segment_sum(contrib.T, seg, num_segments=P + 1)[:P]

def chain(f, inputs, label, n=8):
    out = f(inputs[0])
    _ = np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = f(inputs[i % len(inputs)])
    _ = np.asarray(out.ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")

chain(via_segment_sum, d_list, "segment_sum scatter (14 rows, 6.3M)")

# sorted-ids variant: ids sorted ascending (as if presort order)
ids_sorted = jnp.sort(jnp.where(ids < 0, P, ids))
@jax.jit
def via_sorted_segment_sum(d):
    return jax.ops.segment_sum(d.T, ids_sorted, num_segments=P + 1,
                               indices_are_sorted=True)[:P]
chain(via_sorted_segment_sum, d_list, "segment_sum sorted-ids")

# cumsum-boundary variant over sorted-contiguous layout
bounds = jnp.searchsorted(ids_sorted, jnp.arange(P + 1, dtype=jnp.int32))
@jax.jit
def via_cumsum(d):
    pref = jnp.cumsum(d, axis=1)                      # (14, NBUF)
    lo = jnp.where(bounds[:-1] > 0, bounds[:-1] - 1, 0)
    hi = jnp.maximum(bounds[1:] - 1, 0)
    seg = pref[:, hi] - jnp.where(bounds[:-1] > 0, pref[:, lo], 0.0)
    return seg.T
chain(via_cumsum, d_list, "cumsum + boundary gathers")
log("done")
