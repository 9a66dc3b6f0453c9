#!/usr/bin/env python
"""A/B the binning forward-fill construction: 3 separate 1-col scatters +
[I,3] cumsum (current) vs one packed [n,3] scatter, [3,I] layouts, etc."""
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
    n_src = 508161
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.sort(rng.integers(0, I, n_src)).astype(np.int32))
    d3 = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (n_src, 3))
                     .astype(np.float32))

    # current: 3 separate scatters + stacked [I,3] cumsum
    def cur(pos, d3):
        cols = [jnp.zeros((I,), jnp.float32).at[pos].add(
            d3[:, j], mode="drop", indices_are_sorted=True) for j in range(3)]
        seeds = jnp.stack(cols, axis=1)
        return jnp.cumsum(seeds, axis=0)

    print(f"cur 3x scatter + [I,3]cumsum   {timeit(jax.jit(cur), pos, d3):8.2f} ms", flush=True)
    ref = jax.jit(cur)(pos, d3)

    # packed [n,3] scatter
    def packed(pos, d3):
        seeds = jnp.zeros((I, 3), jnp.float32).at[pos].add(
            d3, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seeds, axis=0)

    t = timeit(jax.jit(packed), pos, d3)
    ok = bool(jnp.array_equal(ref, jax.jit(packed)(pos, d3)))
    print(f"packed [n,3] scatter           {t:8.2f} ms   equal={ok}", flush=True)

    # packed [n,4] scatter (even lanes)
    d4 = jnp.pad(d3, ((0, 0), (0, 1)))

    def packed4(pos, d4):
        seeds = jnp.zeros((I, 4), jnp.float32).at[pos].add(
            d4, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seeds, axis=0)

    print(f"packed [n,4] scatter           {timeit(jax.jit(packed4), pos, d4):8.2f} ms", flush=True)

    # packed [n,8]
    d8 = jnp.pad(d3, ((0, 0), (0, 5)))

    def packed8(pos, d8):
        seeds = jnp.zeros((I, 8), jnp.float32).at[pos].add(
            d8, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seeds, axis=0)

    print(f"packed [n,8] scatter           {timeit(jax.jit(packed8), pos, d8):8.2f} ms", flush=True)

    # transposed: scatter rows of [3, n] into [3, I] along axis 1? XLA wants
    # scatter dims on the major axis; emulate with vmap-style per-row — skip.

    # cumsum variants alone on the current seeds
    seeds = jax.jit(lambda p, d: jnp.stack(
        [jnp.zeros((I,), jnp.float32).at[p].add(d[:, j], mode="drop",
                                                indices_are_sorted=True)
         for j in range(3)], axis=1))(pos, d3)
    print(f"  cumsum [I,3] ax0             {timeit(jax.jit(lambda s: jnp.cumsum(s, 0)), seeds):8.2f} ms", flush=True)
    seedsT = seeds.T
    print(f"  cumsum [3,I] ax1             {timeit(jax.jit(lambda s: jnp.cumsum(s, 1)), seedsT):8.2f} ms", flush=True)
    s1 = seeds[:, 0]
    print(f"  cumsum [I] x1                {timeit(jax.jit(lambda s: jnp.cumsum(s)), s1):8.2f} ms", flush=True)

    # associative_scan instead of cumsum
    from jax.lax import associative_scan
    print(f"  assoc_scan [I,3]             {timeit(jax.jit(lambda s: associative_scan(jnp.add, s, axis=0)), seeds):8.2f} ms", flush=True)

    # complex64 two-channel scatter+cumsum (retest in isolation)
    dc = (d3[:, 0] + 1j * d3[:, 1]).astype(jnp.complex64)

    def cplx(pos, dc):
        seeds = jnp.zeros((I,), jnp.complex64).at[pos].add(
            dc, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seeds)

    print(f"cplx scatter+cumsum (2ch)      {timeit(jax.jit(cplx), pos, dc):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
