#!/usr/bin/env python
"""Is the instance attribute gather really width-blind?  Gather [I] rows
from [P, R] tables at various R, plus sort payload scaling."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

P, I = 500_001, 2_097_152
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, P, I).astype(np.int32))

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

nop = jax.jit(lambda x: x + 1)
z = nop(jnp.zeros((8, 128))); sync(z)
t0 = time.perf_counter()
for _ in range(20):
    z = nop(z)
sync(z)
t_base = time.perf_counter() - t0

def timed(f, *a, iters=10):
    r = f(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    sync(r)
    return max((time.perf_counter() - t0 - t_base) / iters, 1e-9)

for R in (1, 2, 4, 5, 8, 10, 16):
    tab = jnp.asarray(rng.standard_normal((P, R)).astype(np.float32))
    f = jax.jit(lambda tab, idx: tab[idx])
    t = timed(f, tab, idx)
    print(f"gather R={R:2d}: {t*1e3:7.2f} ms  ({t/I*1e9:.2f} ns/row)")

# sort payload scaling at I rows
key = jnp.asarray(rng.integers(0, 8160, I).astype(np.int32))
for nops in (1, 2, 3, 6, 11):
    ops = (key,) + tuple(
        jnp.asarray(rng.standard_normal(I).astype(np.float32))
        for _ in range(nops - 1))
    f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=1))
    t = timed(f, *ops)
    print(f"sort {nops:2d} operands: {t*1e3:7.2f} ms")
