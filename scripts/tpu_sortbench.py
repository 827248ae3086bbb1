#!/usr/bin/env python3
"""Primitive cost measurements for binning redesign: multi-operand sorts vs
gathers vs scatters at representative sizes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

N = 1 << 21           # pair count scale
T = 8160              # tiles
OUT = N + (1 << 21)   # aligned out size

key = jax.random.PRNGKey(0)
keys_i = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
vals = [jax.random.normal(jax.random.PRNGKey(i), (N,)) for i in range(13)]
big_table = jax.random.normal(jax.random.PRNGKey(99), (N,))
small_table = jax.random.normal(jax.random.PRNGKey(98), (T,))
idx_big = jax.random.randint(jax.random.PRNGKey(5), (OUT,), 0, N, dtype=jnp.int32)
idx_small = jax.random.randint(jax.random.PRNGKey(6), (OUT,), 0, T, dtype=jnp.int32)

def bench(fn, *a, label="", n=10):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

bench(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys_i, vals[0],
      label=f"sort 2-operand {N>>20}M")
bench(jax.jit(lambda k, *v: jax.lax.sort((k,) + v, num_keys=1)), keys_i, *vals,
      label=f"sort 14-operand {N>>20}M")
bench(jax.jit(lambda t, i: t[i]), big_table, idx_big,
      label=f"gather {OUT>>20}M from {N>>20}M table")
bench(jax.jit(lambda t, i: t[i]), small_table, idx_small,
      label=f"gather {OUT>>20}M from {T} table")
idx_scat = jax.random.randint(jax.random.PRNGKey(7), (N,), 0, OUT, dtype=jnp.int32)
bench(jax.jit(lambda i, v: jnp.full(OUT, -1.0).at[i].set(v, mode="drop")),
      idx_scat, big_table, label=f"scatter {N>>20}M into {OUT>>20}M")
bench(jax.jit(lambda k: jnp.searchsorted(jnp.sort(k), jnp.arange(T, dtype=jnp.int32))),
      keys_i, label="sort+searchsorted T probes")
srt = jnp.sort(jax.random.randint(jax.random.PRNGKey(9), (T,), 0, OUT, dtype=jnp.int32))
bench(jax.jit(lambda s: jnp.searchsorted(s, jnp.arange(OUT, dtype=jnp.int32), side="right")),
      srt, label=f"searchsorted {OUT>>20}M probes vs {T} table")
bench(jax.jit(lambda: jnp.cumsum(jnp.ones(OUT))), label=f"cumsum {OUT>>20}M")
log("done")
