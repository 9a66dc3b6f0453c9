#!/usr/bin/env python
"""In-kernel gather experiment (VERDICT r3 item 4).

The 12.9 ms attribute gather is a standalone HLO that cannot overlap the
VPU-bound composite kernels on a single-core chip.  The proposed fusion —
issue each chunk's 128 attribute rows as per-row indexed DMAs from the
UNGATHERED [P, 8] table inside the composite kernel's double-buffered DMA
stage — only pays if (a) the DMA engine moves random 32-byte rows at least
as fast as the XLA gather (~5-6 ns/row) and (b) the scalar-core issue cost
of 128 dynamic-index copies per chunk stays under the chunk's ~2.5 us of
VPU compute.

This benchmark isolates exactly those numbers on the real chip:
  A. per-row indexed DMA kernel: 128 make_async_copy(.at[gid]) per chunk
  B. contiguous chunk DMA kernel: ONE [128, 8] block copy per chunk
     (the production kernel's stage — the issue/wait baseline)
  C. the XLA gather of the same ids (the production pre-gather)

Per-row cost of A vs C decides the experiment; receipts land in
docs/PERF_NOTES.md either way.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
# Mosaic cannot slice an HBM row narrower than one 128-lane tile: a per-row
# indexed DMA must move 128 f32 (512 B) even though the production row is 8
# f32 (32 B) -> 16x payload amplification before any issue-rate costs.
R = 128
R_PROD = 8


def _rowdma_kernel(nch, ids_ref, table_ref, out_ref, buf, sem):
    c = pl.program_id(0)
    row = c % 8
    # issue 128 per-row copies (dynamic indices from SMEM), then drain
    copies = []
    for i in range(CHUNK):
        cp = pltpu.make_async_copy(table_ref.at[ids_ref[row, i]],
                                   buf.at[i], sem)
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    out_ref[0] = buf[:]


def rowdma_gather(table, ids, interpret=False):
    nch = ids.shape[0] // CHUNK
    ids2 = ids.reshape(nch, CHUNK)
    if nch % 8:
        raise ValueError("nch must be a multiple of 8")
    return pl.pallas_call(
        functools.partial(_rowdma_kernel, nch),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda c: (c // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, R), lambda c: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, R), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((nch, CHUNK, R), jnp.float32),
        interpret=interpret,
    )(ids2, table)


def _blockdma_kernel(nch, pre_ref, table_ref, out_ref, buf, sem):
    c = pl.program_id(0)
    cp = pltpu.make_async_copy(table_ref.at[c], buf, sem)
    cp.start()
    cp.wait()
    out_ref[0] = buf[:]


def blockdma_copy(table_chunks, interpret=False):
    nch = table_chunks.shape[0]
    return pl.pallas_call(
        functools.partial(_blockdma_kernel, nch),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, R), lambda c: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, R), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((nch, CHUNK, R), jnp.float32),
        interpret=interpret,
    )(jnp.zeros((1, 1), jnp.int32), table_chunks)


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon
    interpret = jax.default_backend() != "tpu"
    P = 500_000
    # 512k rows keeps the 128-lane staging arrays within HBM while
    # the per-row rates generalize to the production 2M
    I = 1 << 19 if not interpret else 1 << 12
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((P, R)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, P, I).astype(np.int32))

    table8 = table[:, :R_PROD]          # the production-width gather operand
    f_row = jax.jit(lambda t, i: rowdma_gather(t, i, interpret))
    f_blk = jax.jit(lambda tc: blockdma_copy(tc, interpret))
    f_xla = jax.jit(lambda t, i: t[i])

    def sync(x):
        return np.asarray(x.ravel()[0])

    # correctness (full readback — interpret/CPU only; on the real chip the
    # 1 GB device->host comparison over the tunnel dwarfs the measurement)
    if interpret:
        a = f_row(table, ids)
        want = np.asarray(table)[np.asarray(ids)].reshape(a.shape)
        np.testing.assert_allclose(np.asarray(a), want)
        print("rowdma gather correct")
    else:
        a = f_row(table, ids)
        b = f_xla(table, ids).reshape(a.shape)
        diff = jnp.max(jnp.abs(a - b))
        assert float(diff) == 0.0, float(diff)
        del a, b
        print("rowdma gather correct (on-device full compare)")

    nch = ids.shape[0] // CHUNK
    chunks = f_xla(table, ids).reshape(nch, CHUNK, R)
    sync(f_blk(chunks)); sync(f_xla(table, ids))

    def timed(f, *args, iters=5):
        sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        sync(r)
        return (time.perf_counter() - t0) / iters

    sync(f_xla(table8, ids))
    t_row = timed(f_row, table, ids)
    t_blk = timed(f_blk, chunks)
    t_xla = timed(f_xla, table, ids)
    t_xla8 = timed(f_xla, table8, ids)
    print(f"rows={I}")
    print(f"A per-row indexed DMA (128 lanes): {t_row*1e3:8.2f} ms  "
          f"({t_row/I*1e9:6.2f} ns/row)")
    print(f"B contiguous chunk DMA (128 lanes): {t_blk*1e3:8.2f} ms  "
          f"({t_blk/I*1e9:6.2f} ns/row)")
    print(f"C XLA gather 128-col  : {t_xla*1e3:8.2f} ms  "
          f"({t_xla/I*1e9:6.2f} ns/row)")
    print(f"D XLA gather 8-col (production): {t_xla8*1e3:8.2f} ms  "
          f"({t_xla8/I*1e9:6.2f} ns/row)")


if __name__ == "__main__":
    main()
