#!/usr/bin/env python
"""Probe gather_rows backward decomposition + sort scaling on the real chip."""
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
    from gsplat_tpu.ops.segment_reduce import segment_sum_sorted

    I = 2490368
    P = 500_000
    R = 11
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, I).astype(np.int32))
    d_out = jnp.asarray(rng.standard_normal((I, R)).astype(np.float32))

    # full bwd
    def bwd(idx, d_out):
        ops = (idx,) + tuple(d_out[:, i] for i in range(R))
        s = jax.lax.sort(ops, num_keys=1)
        vals = jnp.stack(s[1:], axis=1)
        return segment_sum_sorted(vals, s[0], P)

    print(f"gr_bwd total (12-op)       {timeit(jax.jit(bwd), idx, d_out):8.2f} ms", flush=True)

    def sort_only(idx, d_out):
        ops = (idx,) + tuple(d_out[:, i] for i in range(R))
        return jax.lax.sort(ops, num_keys=1)

    print(f"  12-op sort alone         {timeit(jax.jit(sort_only), idx, d_out):8.2f} ms", flush=True)

    sidx = jnp.sort(idx)
    svals = jnp.asarray(rng.standard_normal((I, R)).astype(np.float32))
    seg = jax.jit(lambda v, s: segment_sum_sorted(v, s, P))
    print(f"  segsum kernel alone      {timeit(seg, svals, sidx):8.2f} ms", flush=True)

    # sort scaling with operand count
    for nops in (2, 3, 6, 12):
        ops = (idx,) + tuple(d_out[:, i % R] for i in range(nops - 1))
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
        print(f"  sort {nops:2d}-op unstable     {timeit(f, *ops):8.2f} ms", flush=True)

    # 2-key sorts (class-expansion candidate): 3.2M with 3 operands
    for n in (2490368, 3276800):
        t = jnp.asarray(rng.integers(0, 8161, n).astype(np.int32))
        d = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        g = jnp.asarray(rng.integers(0, P, n).astype(np.int32))
        f2 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
        print(f"  sort 2-key 3-op n={n}  {timeit(f2, t, d, g):8.2f} ms", flush=True)

    # P-level sorts (class bucketing candidate)
    cls = jnp.asarray(rng.integers(0, 12, P).astype(np.int32))
    f6 = jax.jit(lambda c, *v: jax.lax.sort((c,) + v, num_keys=1, is_stable=True))
    vs = tuple(jnp.asarray(rng.integers(0, 1 << 24, P).astype(np.int32))
               for _ in range(5))
    print(f"  sort P 6-op stable       {timeit(f6, cls, *vs):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
