#!/usr/bin/env python
"""Probe tile-histogram + ffill variants on the real chip."""
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
    grid_x, grid_y = 120, 68
    W, H = grid_x + 1, grid_y + 1
    P = 500_000
    rng = np.random.default_rng(0)
    x0 = rng.integers(0, grid_x, P).astype(np.int32)
    y0 = rng.integers(0, grid_y, P).astype(np.int32)
    x1 = np.minimum(x0 + rng.integers(1, 4, P), grid_x).astype(np.int32)
    y1 = np.minimum(y0 + rng.integers(1, 4, P), grid_y).astype(np.int32)
    v = rng.uniform(size=P) < 0.9
    x0j, y0j, x1j, y1j = map(jnp.asarray, (x0, y0, x1, y1))
    vj = jnp.asarray(v)

    dump = H * W

    def hist_current(v, x0, y0, x1, y1):
        pos = jnp.concatenate([jnp.where(v, y0 * W + x0, dump),
                               jnp.where(v, y1 * W + x1, dump)])
        neg = jnp.concatenate([jnp.where(v, y0 * W + x1, dump),
                               jnp.where(v, y1 * W + x0, dump)])
        bins = jnp.arange(H * W + 1, dtype=jnp.int32)
        hp = jnp.diff(jnp.searchsorted(jnp.sort(pos), bins))
        hn = jnp.diff(jnp.searchsorted(jnp.sort(neg), bins))
        h2 = (hp - hn).reshape(H, W)
        counts = jnp.cumsum(jnp.cumsum(h2, axis=0), axis=1)[:grid_y, :grid_x]
        return counts.reshape(-1).astype(jnp.int32)

    def hist_onesort(v, x0, y0, x1, y1):
        keys = jnp.concatenate([
            jnp.where(v, y0 * W + x0, dump), jnp.where(v, y1 * W + x1, dump),
            jnp.where(v, y0 * W + x1, dump), jnp.where(v, y1 * W + x0, dump)])
        sgn = jnp.concatenate([jnp.ones(2 * P, jnp.int32),
                               -jnp.ones(2 * P, jnp.int32)])
        ks, ss = jax.lax.sort((keys, sgn), num_keys=1)
        cum = jnp.cumsum(ss)
        bins = jnp.arange(H * W + 1, dtype=jnp.int32)
        idx = jnp.searchsorted(ks, bins, side="left")
        c0 = jnp.where(idx > 0, cum[jnp.maximum(idx - 1, 0)], 0)
        h2 = jnp.diff(c0).reshape(H, W)
        counts = jnp.cumsum(jnp.cumsum(h2, axis=0), axis=1)[:grid_y, :grid_x]
        return counts.reshape(-1).astype(jnp.int32)

    f_cur = jax.jit(hist_current)
    f_one = jax.jit(hist_onesort)
    a = np.asarray(f_cur(vj, x0j, y0j, x1j, y1j))
    b = np.asarray(f_one(vj, x0j, y0j, x1j, y1j))
    assert np.array_equal(a, b), (a[:10], b[:10])
    print(f"hist current (2 sorts)     {timeit(f_cur, vj, x0j, y0j, x1j, y1j):8.2f} ms", flush=True)
    print(f"hist one-sort+cumsum       {timeit(f_one, vj, x0j, y0j, x1j, y1j):8.2f} ms", flush=True)

    # components
    pos_np = rng.integers(0, dump, 2 * P).astype(np.int32)
    posj = jnp.asarray(pos_np)
    srt = jax.jit(jnp.sort)
    print(f"  jnp.sort(1M)             {timeit(srt, posj):8.2f} ms", flush=True)
    spos = srt(posj)
    bins = jnp.arange(H * W + 1, dtype=jnp.int32)
    ss_scan = jax.jit(lambda s: jnp.searchsorted(s, bins, method="scan"))
    print(f"  searchsorted scan (8k q) {timeit(ss_scan, spos):8.2f} ms", flush=True)
    ss_sort = jax.jit(lambda s: jnp.searchsorted(s, bins, method="sort"))
    print(f"  searchsorted sort (8k q) {timeit(ss_sort, spos):8.2f} ms", flush=True)
    ss_cv = jax.jit(lambda s: jnp.searchsorted(s, bins, method="compare_all"))
    try:
        print(f"  searchsorted cmpall      {timeit(ss_cv, spos):8.2f} ms", flush=True)
    except Exception as e:
        print(f"  searchsorted cmpall      n/a ({type(e).__name__})", flush=True)

    # ffill via one scatter of int32 vs segment boundaries one-hot
    I = 2490368
    n_src = P + 8160 + 1
    pos_s = jnp.asarray(np.sort(rng.integers(0, I, n_src)).astype(np.int32))
    val_s = jnp.asarray(rng.integers(0, 1 << 20, n_src).astype(np.int32))

    def ffill1(pos, vals):
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        seed = jnp.zeros((I,), jnp.int32).at[pos].add(
            deltas, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seed)

    f1 = jax.jit(ffill1)
    print(f"  ffill scatter+cumsum x1  {timeit(f1, pos_s, val_s):8.2f} ms", flush=True)

    scat_set = jax.jit(lambda p, d: jnp.zeros((I,), jnp.int32).at[p].set(
        d, mode="drop", indices_are_sorted=True, unique_indices=True))
    print(f"  scatter SET 1col         {timeit(scat_set, pos_s, val_s):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
