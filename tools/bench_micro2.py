#!/usr/bin/env python
"""Micro-probes: payload-sort operand scaling, segsum alone, int div/mod,
iota-free expansion pieces — to decide the next rasterizer optimizations."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    I = 2490368
    P = 500_000
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8161, I).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, P, I).astype(np.int32))
    fcols = [jnp.asarray(rng.standard_normal(I).astype(np.float32))
             for _ in range(11)]

    # payload sort scaling: 1 key + k payloads
    for k in (1, 3, 5, 7, 11):
        ops = (tile, gid) + tuple(fcols[:k - 1])
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True))
        print(f"sort 1key+{k}payload      {timeit(f, *ops):8.2f} ms", flush=True)

    # segsum alone (sorted ids)
    from gsplat_tpu.ops.segment_reduce import segment_sum_sorted
    sids = jnp.sort(gid)
    vals = jnp.asarray(rng.standard_normal((I, 11)).astype(np.float32))
    ss = jax.jit(lambda v, s: segment_sum_sorted(v, s, P))
    print(f"segsum 2.5M x 11          {timeit(ss, vals, sids):8.2f} ms", flush=True)

    # int div/mod by non-constant vector vs float trick
    k = jnp.asarray(rng.integers(0, 8160, I).astype(np.int32))
    rw = jnp.asarray(rng.integers(1, 128, I).astype(np.int32))

    def int_divmod(k, rw):
        q = k // rw
        return q, k - q * rw

    def f32_divmod(k, rw):
        q = jnp.floor((k.astype(jnp.float32) + 0.5) / rw.astype(jnp.float32))
        q = q.astype(jnp.int32)
        return q, k - q * rw

    print(f"int divmod [2.5M]         {timeit(jax.jit(int_divmod), k, rw):8.2f} ms", flush=True)
    print(f"f32 divmod [2.5M]         {timeit(jax.jit(f32_divmod), k, rw):8.2f} ms", flush=True)
    # check exactness
    qa, ra = jax.jit(int_divmod)(k, rw)
    qb, rb = jax.jit(f32_divmod)(k, rw)
    print("divmod exact:", bool(jnp.all(qa == qb)), flush=True)

    # cumsum variants over [I]
    x = jnp.asarray(rng.integers(-5, 5, I).astype(np.int32))
    print(f"cumsum i32 [2.5M]         {timeit(jax.jit(jnp.cumsum), x):8.2f} ms", flush=True)
    xf = x.astype(jnp.float32)
    print(f"cumsum f32 [2.5M]         {timeit(jax.jit(jnp.cumsum), xf):8.2f} ms", flush=True)
    x2 = jnp.stack([x, x, x], 1)
    print(f"cumsum i32 [2.5M,3] ax0   {timeit(jax.jit(lambda v: jnp.cumsum(v, 0)), x2):8.2f} ms", flush=True)

    # scatter 1col over I at n_src=508k positions
    n_src = P + 8161
    pos = jnp.asarray(np.sort(rng.integers(0, I, n_src)).astype(np.int32))
    d1 = jnp.asarray(rng.integers(-3, 3, n_src).astype(np.int32))
    sc = jax.jit(lambda p, d: jnp.zeros((I,), jnp.int32).at[p].add(
        d, mode="drop", indices_are_sorted=True))
    print(f"scatter 1col 508k->2.5M   {timeit(sc, pos, d1):8.2f} ms", flush=True)

    # gather variants: 500k rows from [500k,12] vs 2.5M rows
    tbl = jnp.asarray(rng.standard_normal((P + 1, 12)).astype(np.float32))
    idxP = jnp.asarray(rng.permutation(P).astype(np.int32))
    gP = jax.jit(lambda t, i: t[i])
    print(f"gather 500k rows x12      {timeit(gP, tbl, idxP):8.2f} ms", flush=True)
    gI = jax.jit(lambda t, i: t[i])
    print(f"gather 2.5M rows x12      {timeit(gI, tbl, gid):8.2f} ms", flush=True)
    tbl1 = tbl[:, :1]
    print(f"gather 2.5M rows x1       {timeit(gI, tbl1, gid):8.2f} ms", flush=True)

    # take_along/one-hot matmul gather alternative: dense [I] x [P] too big.
    # searchsorted over I for 8k queries
    q8 = jnp.arange(0, 8161, dtype=jnp.int32)
    f = jax.jit(lambda s, q: jnp.searchsorted(s, q))
    print(f"searchsorted 2.5M/8k      {timeit(f, jnp.sort(tile), q8):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
