#!/usr/bin/env python3
"""Micro-bench binning sub-stages at MP=2M, P=100k (varying inputs)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

P = 100_000
MP = 1 << 21
T = 2500
keyseeds = [jax.random.PRNGKey(i) for i in range(8)]
touched_list = [jax.random.randint(k, (P,), 0, 6, dtype=jnp.int32)
                for k in keyseeds]
table = jax.random.normal(jax.random.PRNGKey(99), (P, 8))
keys_u32 = [jax.random.randint(k, (MP,), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)
            for k in keyseeds]
ids_mp = [jax.random.randint(k, (MP,), 0, P, dtype=jnp.int32)
          for k in keyseeds]
jax.block_until_ready([touched_list, table, keys_u32, ids_mp])

def bench(fn, inputs, label, n=8):
    out = fn(inputs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

bench(jax.jit(lambda t: jnp.repeat(jnp.arange(P, dtype=jnp.int32), t,
                                   total_repeat_length=MP)),
      touched_list, "repeat P->2M")
bench(jax.jit(lambda i: table[i]), ids_mp, "row-gather (2M,8)")
bench(jax.jit(lambda i: (table[:, 0][i], table[:, 1][i], table[:, 2][i],
                         table[:, 3][i], table[:, 4][i])),
      ids_mp, "5 col-gathers 2M")

def elemwise(g8):
    slot = jnp.arange(MP, dtype=jnp.int32)
    j = slot - g8[:, 3].astype(jnp.int32)
    rw = jnp.maximum(g8[:, 2].astype(jnp.int32), 1)
    tx = g8[:, 0].astype(jnp.int32) + j % rw
    ty = g8[:, 1].astype(jnp.int32) + j // rw
    tid = jnp.clip(ty * 50 + tx, 0, T)
    return (tid.astype(jnp.uint32) << 19) | (g8[:, 4].astype(jnp.uint32)
                                             & 0x7FFFF)
g8s = [table[i] for i in ids_mp[:4]]
jax.block_until_ready(g8s)
bench(jax.jit(elemwise), g8s, "per-pair tile+key elementwise")

bench(jax.jit(lambda k: jax.lax.sort((k, ids_mp[0]), num_keys=1,
                                     is_stable=True)),
      keys_u32, "sort (u32,i32) 2M")
sorted_keys = jax.lax.sort((keys_u32[0],))[0]
probes = (jnp.arange(T + 1, dtype=jnp.uint32) << 19)
bench(jax.jit(lambda sk: jnp.searchsorted(sk, probes, side="left")),
      [sorted_keys] * 2, "searchsorted 2.5k probes")
bench(jax.jit(lambda sk: sk >> 19), [sorted_keys] * 2, "shift 2M (pair_tiles)")

# full current bin_gaussians for comparison
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
m2s = [jax.random.uniform(k, (P, 2), minval=0, maxval=800) for k in keyseeds]
deps = jax.random.uniform(jax.random.PRNGKey(5), (P,), minval=1, maxval=9)
radii = jax.random.randint(jax.random.PRNGKey(6), (P,), 0, 12, dtype=jnp.int32)
jax.block_until_ready([m2s, deps, radii])

def full(m2):
    b = bin_gaussians(m2, deps, radii, 800, 800, MP)
    return b.ids[0] + b.tile_starts[17] + b.tile_counts[33] + b.total_pairs
bench(jax.jit(full), m2s, "bin_gaussians FULL")

# gather layout variants
table16 = jax.random.normal(jax.random.PRNGKey(98), (P, 16))
jax.block_until_ready(table16)
bench(jax.jit(lambda i: table16[i]), ids_mp, "row-gather (2M,16)")
bench(jax.jit(lambda i: jax.lax.optimization_barrier(table[i])), ids_mp,
      "row-gather (2M,8)+barrier")
bench(jax.jit(lambda i: jax.lax.optimization_barrier(table16[i])), ids_mp,
      "row-gather (2M,16)+barrier")
pad_table = jnp.concatenate([table, jnp.zeros((P, 8))], axis=1)
jax.block_until_ready(pad_table)
bench(jax.jit(lambda i: jax.lax.optimization_barrier(pad_table[i])[:, :8]),
      ids_mp, "row-gather 8-in-16pad+barrier")
# elementwise+key fused onto the gather (the real binning shape)
def gather_key(i):
    g8 = table[i]
    return elemwise(g8)
bench(jax.jit(gather_key), ids_mp, "gather8 + key fused")
def gather_key_b(i):
    g8 = jax.lax.optimization_barrier(table[i])
    return elemwise(g8)
bench(jax.jit(gather_key_b), ids_mp, "gather8(barrier) + key")

# monotone (expansion-order) gather vs random
mono_ids = [jnp.sort(i) for i in ids_mp[:4]]
jax.block_until_ready(mono_ids)
bench(jax.jit(lambda i: jax.lax.optimization_barrier(table[i])), mono_ids,
      "row-gather (2M,8) MONOTONE ids")
# repeat-based expansion of table columns (5 repeats)
t5 = [table[:, c] for c in range(5)]
def rep5(t):
    return [jnp.repeat(c, t, total_repeat_length=MP) for c in t5]
bench(jax.jit(rep5), touched_list, "5x repeat-expand cols")
# 2D diff-array histogram for tile counts
gx, gy = 50, 50
minx = jax.random.randint(jax.random.PRNGKey(11), (P,), 0, gx, dtype=jnp.int32)
miny = jax.random.randint(jax.random.PRNGKey(12), (P,), 0, gy, dtype=jnp.int32)
w_ = jax.random.randint(jax.random.PRNGKey(13), (P,), 1, 4, dtype=jnp.int32)
h_ = jax.random.randint(jax.random.PRNGKey(14), (P,), 1, 4, dtype=jnp.int32)
maxx = jnp.minimum(minx + w_, gx); maxy = jnp.minimum(miny + h_, gy)
jax.block_until_ready([minx, miny, maxx, maxy])
def hist(mx):
    d = jnp.zeros((gy + 1, gx + 1), jnp.int32)
    one = jnp.ones((P,), jnp.int32)
    d = d.at[miny, mx].add(one).at[miny, maxx].add(-one)
    d = d.at[maxy, mx].add(-one).at[maxy, maxx].add(one)
    c = jnp.cumsum(jnp.cumsum(d, axis=0), axis=1)[:gy, :gx]
    return jnp.cumsum(c.reshape(-1))
bench(jax.jit(hist), [minx, minx + 0], "2D diff-hist + cumsum (tile starts)")
