#!/usr/bin/env python3
"""Compare payload-movement strategies for binning (varying inputs):
(a) 13 element-gathers by pair ids, (b) one row-gather of (P,16) rows,
(c) 13 repeats (monotone expansion), (d) 14-operand sort carry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

P = 200_000
N = 1 << 21

rows16 = [jax.random.normal(jax.random.PRNGKey(i), (P, 16)) for i in range(6)]
cols = [[r[:, j] for j in range(13)] for r in rows16]
idss = [jax.random.randint(jax.random.PRNGKey(50 + i), (N,), 0, P,
                           dtype=jnp.int32) for i in range(6)]
touched_list = []
for i in range(6):
    t = jax.random.randint(jax.random.PRNGKey(80 + i), (P,), 0, 21,
                           dtype=jnp.int32)
    touched_list.append(t)
jax.block_until_ready([rows16, idss, touched_list])

def bench_vary(fn, n_inputs, label="", n=6):
    out = fn(0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn((i + 1) % n_inputs)
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

f_elem = jax.jit(lambda ids, r: [r[:, j][ids] for j in range(13)])
bench_vary(lambda i: f_elem(idss[i], rows16[i]), 6,
           label="(a) 13 element-gathers 2M")

f_row = jax.jit(lambda ids, r: r[ids])
bench_vary(lambda i: f_row(idss[i], rows16[i]), 6,
           label="(b) row-gather (2M x 16)")

f_rep = jax.jit(lambda t, r: [jnp.repeat(r[:, j], t, total_repeat_length=N)
                              for j in range(13)])
bench_vary(lambda i: f_rep(touched_list[i], rows16[i]), 6,
           label="(c) 13 repeats 200k->2M")

keys = [jax.random.randint(jax.random.PRNGKey(90 + i), (N,), 0, 8160,
                           dtype=jnp.int32) for i in range(6)]
vals13 = [jax.random.normal(jax.random.PRNGKey(200 + j), (N,))
          for j in range(13)]
jax.block_until_ready([keys, vals13])
f_sort = jax.jit(lambda k: jax.lax.sort((k,) + tuple(vals13), num_keys=1))
bench_vary(lambda i: f_sort(keys[i]), 6, label="(d) 14-op sort 2M")

# (e) histogram: counts per tile via scatter-add
f_hist = jax.jit(lambda k: jnp.zeros(8161, jnp.int32).at[k].add(1))
bench_vary(lambda i: f_hist(keys[i]), 6, label="(e) histogram 2M->8160")
log("done")
