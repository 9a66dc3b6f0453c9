#!/usr/bin/env python
"""Isolate DMA latency vs compute in the composite forward kernel.

Hypothesis (r2): with ~8160 programs x ~2-3 chunks each, the FIRST chunk's
DMA latency of every program is fully exposed (the double buffer only
overlaps chunks WITHIN a tile).  If a DMA-only kernel costs a large share
of the full kernel's time, the fix is cross-tile prefetch (the chunk table
is one contiguous global sequence — pad-inline binning guarantees
chunk0_{t+1} = chunk0_t + nchunks_t), or fusing several tiles per program.

Variants on an identical synthetic workload (1080p tile grid, ~realistic
per-tile instance counts):
  full      — the production forward kernel (gsplat_tpu.ops.composite_pallas)
  dma_only  — same DMA schedule, compute = one add per chunk
  compute0  — DMA chunk 0 once per program, full compute on it every chunk
  fused4    — dma_only but 4 tiles per program (amortizes exposed latency)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops import composite_pallas as cp

CHUNK = cp.CHUNK
TILE_PIX = cp.TILE_PIX


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


def make_workload(grid_x=120, grid_y=68, mean_count=200, R=16, seed=0):
    rng = np.random.default_rng(seed)
    T = grid_x * grid_y
    counts = np.maximum(0, rng.normal(mean_count, 80, T)).astype(np.int64)
    padded = (counts + CHUNK - 1) // CHUNK * CHUNK
    chunk0 = np.concatenate([[0], np.cumsum(padded // CHUNK)])[:-1]
    NCH = int(np.sum(padded) // CHUNK)
    attr = rng.standard_normal((NCH, R, CHUNK)).astype(np.float32) * 0.01
    Tpad = (T + 7) // 8 * 8
    ranges = np.zeros((Tpad, 4), np.int32)
    ranges[:T, 0] = chunk0
    ranges[:T, 1] = counts
    ranges[:T, 2] = NCH              # nch_used bound for the prefetch
    print(f"# tiles={T} NCH={NCH} instances~{counts.sum()} "
          f"table={NCH*R*CHUNK*4/1e6:.0f} MB")
    return jnp.asarray(attr), jnp.asarray(ranges), T, NCH, R


def _dma_only_kernel(R, ranges_ref, attr_ref, out_ref, buf, sems):
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]
    count = ranges_ref[t % 8, 1]
    nchunks = (count + CHUNK - 1) // CHUNK

    def dma(slot, c):
        return pltpu.make_async_copy(attr_ref.at[chunk0 + c],
                                     buf.at[slot], sems.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(c, acc):
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()
        return acc + jnp.sum(buf[slot, 0:1, :])   # touch the data

    acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((), jnp.float32))
    out_ref[0] = jnp.full((8, 128), acc, jnp.float32)


def _compute0_kernel(C, R, ranges_ref, attr_ref, out_ref, buf, sems):
    """Full per-chunk compute, but all chunks read the SAME resident
    buffer (chunk0) — isolates pure compute cost."""
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]
    count = ranges_ref[t % 8, 1]
    nchunks = (count + CHUNK - 1) // CHUNK
    px, py, origin = cp._pixel_coords(t, 120)

    cpy = pltpu.make_async_copy(attr_ref.at[chunk0], buf.at[0], sems.at[0])

    @pl.when(nchunks > 0)
    def _():
        cpy.start()

    @pl.when(nchunks > 0)
    def _():
        cpy.wait()

    def body(c, carry):
        T, nc, acc = carry
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx
        valid = pos < count
        a, mask, _ = cp._chunk_alpha(buf[0], px, py, valid,
                                     need_dxy=False)
        done = T < 0.0
        Tv = jnp.abs(T)
        a = jnp.where(mask & ~done, a, 0.0)
        T_incl = Tv * cp._cumprod0(1.0 - a)
        ok = T_incl >= cp.T_EPS
        contrib = mask & ~done & ok
        T_excl = jnp.concatenate([Tv, T_incl[:-1]], axis=0)
        w = jnp.where(contrib, a * T_excl, 0.0)
        T_frozen = jnp.min(jnp.where(ok, T_incl, Tv), axis=0, keepdims=True)
        terminated = done | (T_incl[-1:] < cp.T_EPS)
        T_new = jnp.where(terminated, -T_frozen, T_frozen)
        acc = acc + jax.lax.dot_general(
            buf[0, cp.ATTR_BASE:cp.ATTR_BASE + C], w,
            (((1,), (0,)), ((), ())), precision=cp._HI)
        nc = jnp.maximum(nc, jnp.max(
            jnp.where(contrib, pos + 1, 0), axis=0, keepdims=True))
        return T_new, nc, acc

    T, nc, acc = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.int32),
         jnp.zeros((C, TILE_PIX), jnp.float32)))
    out_ref[0] = jnp.concatenate(
        [acc, jnp.abs(T), nc.astype(jnp.float32)], axis=0)


def _fused4_kernel(R, ranges_ref, attr_ref, out_ref, buf, sems):
    """dma_only over 4 consecutive tiles per program with a GLOBAL linear
    chunk walk: the exposed first-chunk latency amortizes 4x."""
    # ranges block covers 8 tiles; program p handles tiles 4p..4p+3, so
    # block index = p//2, row offset = (p%2)*4
    p = pl.program_id(0)
    row0 = (p % 2) * 4

    g_start = ranges_ref[row0, 0]
    total = jnp.int32(0)
    for i in range(4):
        cnt = ranges_ref[row0 + i, 1]
        total = total + (cnt + CHUNK - 1) // CHUNK

    def dma(slot, g):
        return pltpu.make_async_copy(attr_ref.at[g], buf.at[slot],
                                     sems.at[slot])

    @pl.when(total > 0)
    def _():
        dma(0, g_start).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < total)
        def _():
            dma((i + 1) % 2, g_start + i + 1).start()

        dma(slot, g_start + i).wait()
        return acc + jnp.sum(buf[slot, 0:1, :])

    acc = jax.lax.fori_loop(0, total, body, jnp.zeros((), jnp.float32))
    out_ref[0] = jnp.full((8, 128), acc, jnp.float32)


def main():
    attr, ranges, T, NCH, R = make_workload()
    C = 5

    # --- full production forward
    static = (120, T, C, R, NCH, False, False)
    full = jax.jit(lambda a, r: cp._pallas_forward(static, a, r))
    t_full = timeit(full, attr, ranges)

    # --- dma only
    dk = functools.partial(_dma_only_kernel, R)
    dma_only = jax.jit(lambda a, r: pl.pallas_call(
        dk, grid=(T,),
        in_specs=[pl.BlockSpec((8, 4), lambda t: (t // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, R, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32))(r, a))
    t_dma = timeit(dma_only, attr, ranges)

    # --- compute only (resident buffer)
    ck = functools.partial(_compute0_kernel, C, R)
    comp = jax.jit(lambda a, r: pl.pallas_call(
        ck, grid=(T,),
        in_specs=[pl.BlockSpec((8, 4), lambda t: (t // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, R, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
        out_shape=jax.ShapeDtypeStruct((T, C + 2, TILE_PIX), jnp.float32))(r, a))
    t_comp = timeit(comp, attr, ranges)

    # --- fused 4 tiles/program, dma only
    T4 = T // 4
    fk = functools.partial(_fused4_kernel, R)
    fused = jax.jit(lambda a, r: pl.pallas_call(
        fk, grid=(T4,),
        in_specs=[pl.BlockSpec((8, 4), lambda p: (p // 2, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda p: (p, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, R, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        out_shape=jax.ShapeDtypeStruct((T4, 8, 128), jnp.float32))(r, a))
    t_fused = timeit(fused, attr, ranges)

    print(f"full kernel      : {t_full:7.2f} ms")
    print(f"dma only         : {t_dma:7.2f} ms")
    print(f"compute resident : {t_comp:7.2f} ms")
    print(f"dma only fused4  : {t_fused:7.2f} ms")


if __name__ == "__main__":
    main()
