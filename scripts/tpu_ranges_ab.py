#!/usr/bin/env python3
"""A/B: tile-range recovery from the sorted key array.

(a) current: searchsorted(sorted_key, probes, scan_unrolled) — one probe per
    tile boundary (2041 probes at the 1080p/32x16 bench config).
(b) scatter-min of slot index per tile + reverse cummin fill — one streaming
    pass over the pair bucket instead of per-probe scans.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

log("devices:", jax.devices())

MP = 714_000 // 128 * 128 + 128          # bench-config pair bucket
NT = 60 * 34                              # 1080p at 32x16 tiles
DEPTH_BITS = 32 - (NT + 1).bit_length()   # mirrors _key_bits
rng = np.random.default_rng(0)

def make_keys(seed):
    r = np.random.default_rng(seed)
    tiles = np.sort(r.integers(0, NT, MP).astype(np.uint32))
    depth = r.integers(0, 1 << DEPTH_BITS, MP).astype(np.uint32)
    key = (tiles << DEPTH_BITS) | depth
    # tail of invalid pairs, like real binning
    ninv = MP // 10
    key[-ninv:] = np.uint32(NT) << DEPTH_BITS
    return jnp.asarray(np.sort(key))

keys = [make_keys(s) for s in range(8)]
jax.block_until_ready(keys)

probes = (jnp.arange(NT + 1, dtype=jnp.uint32) << DEPTH_BITS)

@jax.jit
def via_searchsorted(sk):
    return jnp.searchsorted(sk, probes, side="left",
                            method="scan_unrolled").astype(jnp.int32)

@jax.jit
def via_scatter(sk):
    tile = (sk >> DEPTH_BITS).astype(jnp.int32)        # sorted, ascending
    slot = jnp.arange(MP, dtype=jnp.int32)
    firsts = jnp.full((NT + 2,), MP, jnp.int32).at[tile].min(
        slot, mode="drop", indices_are_sorted=True)
    # bounds[t] = first slot with tile >= t → reverse cummin over firsts
    rev = jnp.flip(jax.lax.cummin(jnp.flip(firsts)))
    return rev[:NT + 1]

# correctness
for k in keys[:3]:
    a = np.asarray(via_searchsorted(k))
    b = np.asarray(via_scatter(k))
    assert (a == b).all(), (a[:10], b[:10])
log("outputs identical")

def bench(fn, label, n=20):
    fn(keys[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(keys[i % len(keys)])
    out.block_until_ready()
    log(f"{label}: {(time.perf_counter()-t0)/n*1e3:.3f} ms")

bench(via_searchsorted, "searchsorted scan_unrolled")
bench(via_scatter, "scatter-min + reverse cummin")
