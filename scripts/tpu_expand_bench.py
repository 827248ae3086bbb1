#!/usr/bin/env python3
"""Honest (chained, materialized) costs of payload expansion options."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

P = 100_000
MP = 1 << 21

rows = jax.random.normal(jax.random.PRNGKey(0), (P, 16))

def chain(f, init, label, n=8):
    s = f(init)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")

# (a) 13 repeats 100k -> 2M (monotone expansion), chained via mutating counts
t0arr = jax.random.randint(jax.random.PRNGKey(1), (P,), 0, 41,
                           dtype=jnp.int32)
@jax.jit
def rep_chain(t):
    outs = [jnp.repeat(rows[:, j], t, total_repeat_length=MP)
            for j in range(13)]
    s = sum(o[::65536].sum() for o in outs)
    return jnp.clip(t + (s.astype(jnp.int32) % 3 - 1), 0, 41)
chain(rep_chain, t0arr, "(a) 13 repeats 100k->2M")

# (b) ONE repeat of ids + later use (what current code does pre-sort)
@jax.jit
def rep1_chain(t):
    ids = jnp.repeat(jnp.arange(P, dtype=jnp.int32), t,
                     total_repeat_length=MP)
    return jnp.clip(t + (ids[::65536].sum() % 3 - 1), 0, 41)
chain(rep1_chain, t0arr, "(b) 1 repeat (ids)")

# (c) row gather (2M, 16) by random ids, chained by mutating ids
ids0 = jax.random.randint(jax.random.PRNGKey(2), (MP,), 0, P,
                          dtype=jnp.int32)
@jax.jit
def rowg_chain(ids):
    g = rows[ids]                 # (MP, 16)
    return (ids + g[::65536, 0].sum().astype(jnp.int32) % 3) % P
chain(rowg_chain, ids0, "(c) row-gather (2M,16) random")

# (d) 13 element gathers random ids
@jax.jit
def eg_chain(ids):
    outs = [rows[:, j][ids] for j in range(13)]
    s = sum(o[::65536].sum() for o in outs)
    return (ids + s.astype(jnp.int32) % 3) % P
chain(eg_chain, ids0, "(d) 13 element-gathers random")

# (e) 14-operand sort at 2.6M (hole-sort size for tight bucket)
N2 = (1 << 19) + 2_088_960
keys0 = jax.random.randint(jax.random.PRNGKey(3), (N2,), 0, 8160,
                           dtype=jnp.int32)
vals = [jax.random.normal(jax.random.PRNGKey(100 + j), (N2,))
        for j in range(13)]
@jax.jit
def sort_chain(k):
    out = jax.lax.sort((k,) + tuple(vals), num_keys=1)
    return (k + out[1][::65536].sum().astype(jnp.int32) % 3) % 8160
chain(sort_chain, keys0, f"(e) 14-op sort {N2/1e6:.1f}M")

# (f) histogram 2M -> 8160 via scatter-add, chained
tid0 = jax.random.randint(jax.random.PRNGKey(4), (MP,), 0, 8161,
                          dtype=jnp.int32)
@jax.jit
def hist_chain(tid):
    h = jnp.zeros(8161, jnp.int32).at[tid].add(1)
    return (tid + h[0] % 2) % 8161
chain(hist_chain, tid0, "(f) histogram scatter-add 2M->8160")
log("done")
