"""Tile binning: duplicate gaussians per touched tile, sort by (tile, depth),
find per-tile ranges.

Behavioral spec: reference rasterizer_impl.cu:70-138,279-322 (duplicateWithKeys
+ CUB radix SortPairs + identifyTileRanges).  TPU-native redesign:

- The CUDA path reads back the instance count to the host to size buffers
  (rasterizer_impl.cu:283-289) — a forced device sync.  Here everything is
  FIXED CAPACITY (``max_instances``) so the whole step stays inside one jit
  (SURVEY.md §7.1); overflow is detected and reported, never crashes.
- The 64-bit key radix sort becomes a single lexicographic
  ``jax.lax.sort`` with two int32 keys (tile id, depth bits) — positive-float
  bit patterns sort identically to their values, the same trick the CUDA key
  packing uses (rasterizer_impl.cu:70-111).
- ``identifyTileRanges`` becomes a vectorized ``searchsorted``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.preprocess import PreprocessOut


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray     # [I] int32 sorted gaussian index (P = sentinel pad)
    tile_id: jnp.ndarray      # [I] int32 sorted tile index (num_tiles = pad)
    tile_start: jnp.ndarray   # [T] int32 start offset into the sorted list
    tile_count: jnp.ndarray   # [T] int32 instances per tile
    num_rendered: jnp.ndarray # [] int32 true instance count (may exceed capacity)
    overflow: jnp.ndarray     # [] bool capacity exceeded


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_instances: int) -> BinningOut:
    P = pre.depths.shape[0]
    num_tiles = grid_x * grid_y

    tiles_touched = pre.tiles_touched
    num_rendered = jnp.sum(tiles_touched)
    overflow = num_rendered > max_instances

    # Exclusive scan -> per-gaussian instance offsets (rasterizer_impl.cu:281).
    offsets = jnp.cumsum(tiles_touched) - tiles_touched  # [P]

    # Expand to instances with a sentinel row (id = P) absorbing the padding,
    # so truncation at max_instances keeps real instances only.
    ids_ext = jnp.arange(P + 1, dtype=jnp.int32)
    touched_ext = jnp.concatenate(
        [tiles_touched, jnp.array([max_instances], jnp.int32)]
    )
    inst_gauss = jnp.repeat(ids_ext, touched_ext, total_repeat_length=max_instances)

    # k-th touched tile of that gaussian -> (tx, ty) within its rect
    # (duplicateWithKeys, rasterizer_impl.cu:70-111).
    offs_ext = jnp.concatenate([offsets, num_rendered[None]])
    k = jnp.arange(max_instances, dtype=jnp.int32) - offs_ext[inst_gauss]
    rect_min = jnp.concatenate([pre.rect_min, jnp.zeros((1, 2), jnp.int32)])
    rect_max = jnp.concatenate([pre.rect_max, jnp.ones((1, 2), jnp.int32)])
    rw = jnp.maximum(rect_max[inst_gauss, 0] - rect_min[inst_gauss, 0], 1)
    ty = rect_min[inst_gauss, 1] + k // rw
    tx = rect_min[inst_gauss, 0] + k % rw
    is_pad = inst_gauss >= P
    tile = jnp.where(is_pad, num_tiles, ty * grid_x + tx).astype(jnp.int32)

    # Depth key: positive fp32 bit pattern is order-preserving as int32.
    depths_ext = jnp.concatenate([pre.depths, jnp.zeros((1,), pre.depths.dtype)])
    depth_bits = jax.lax.bitcast_convert_type(
        depths_ext[inst_gauss].astype(jnp.float32), jnp.int32
    )

    tile_s, _, gauss_s = jax.lax.sort(
        (tile, depth_bits, inst_gauss), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, tile_ids + 1, side="left").astype(jnp.int32)

    return BinningOut(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_start=tile_start,
        tile_count=(tile_end - tile_start).astype(jnp.int32),
        num_rendered=num_rendered.astype(jnp.int32),
        overflow=overflow,
    )


def pad_tile_ranges(bins: BinningOut, chunk: int, capacity: int) -> BinningOut:
    """Re-lay the sorted instance list so every tile's range starts at a
    multiple of ``chunk`` (pad slots get the sentinel gaussian id).

    This is the layout the Pallas kernels consume: chunk-aligned DMA on both
    the forward read path and the backward per-instance gradient write path,
    with no chunk ever straddling two tiles (so the backward's HBM writes are
    race-free by construction — the TPU substitute for CUDA's atomicAdd,
    SURVEY.md §5 'revision-safe accumulation').
    """
    T = bins.tile_start.shape[0]
    padded_counts = ((bins.tile_count + chunk - 1) // chunk) * chunk
    padded_start = jnp.cumsum(padded_counts) - padded_counts
    total_padded = jnp.sum(padded_counts)
    overflow = bins.overflow | (total_padded > capacity)

    # position of sorted instance j in the padded layout
    I = bins.gauss_id.shape[0]
    tile_of_j = bins.tile_id  # [I], == num_tiles for pad entries
    safe_tile = jnp.minimum(tile_of_j, T - 1)
    rank = jnp.arange(I, dtype=jnp.int32) - bins.tile_start[safe_tile]
    pos = padded_start[safe_tile] + rank
    pos = jnp.where(tile_of_j < T, pos, capacity)  # drop pad entries

    gid_padded = jnp.full((capacity,), jnp.int32(2 ** 30), jnp.int32)
    gid_padded = gid_padded.at[pos].set(bins.gauss_id, mode="drop")
    # unwritten pad slots keep 2^30 -> caller clamps to its sentinel row
    return BinningOut(
        gauss_id=gid_padded,
        tile_id=bins.tile_id,
        tile_start=padded_start.astype(jnp.int32),
        tile_count=bins.tile_count,
        num_rendered=bins.num_rendered,
        overflow=overflow,
    )
