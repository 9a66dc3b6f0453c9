"""Tile binning: duplicate gaussians per touched tile, sort by (tile, depth),
find per-tile ranges — with CHUNK-ALIGNED per-tile segments.

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
- **Pad-inline alignment** (no CUDA analogue): per-tile PAD instances
  (tile t, depth=+inf, gaussian=sentinel) are injected BEFORE the sort so
  every tile's sorted segment is padded to a multiple of ``align`` and
  therefore starts at an ``align``-aligned offset.  The sorted gaussian-id
  list is then directly consumable by the Pallas composite kernels as
  fixed-size blocks — no post-sort padded relayout, no second gather (TPU
  indexed ops cost ~7ns/row, so every eliminated 4M-row gather is ~25ms).
  Pad counts come from a sort-based 2D corner histogram of the tile rects
  (scatter-add is ~3x slower than sort+searchsorted for this on TPU).
- ``tile_start`` is computed from the padded-count prefix sum (exact by
  construction), not searchsorted.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.preprocess import PreprocessOut

INF_DEPTH_BITS = 0x7F800000  # +inf float bits: sorts after every real depth


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray     # [I] int32 sorted gaussian index (P = pad/sentinel)
    tile_id: jnp.ndarray      # [I] int32 sorted tile index (num_tiles = pad)
    tile_start: jnp.ndarray   # [T] int32 ALIGN-aligned start offset per tile
    tile_count: jnp.ndarray   # [T] int32 REAL instances per tile (pads excluded)
    num_rendered: jnp.ndarray # [] int32 true instance count (may exceed capacity)
    overflow: jnp.ndarray     # [] bool capacity exceeded


def _tile_histogram(pre: PreprocessOut, grid_x: int, grid_y: int):
    """Per-tile real instance counts via a 2D difference array whose corner
    deposits are accumulated with sort + searchsorted (not scatter)."""
    W, H = grid_x + 1, grid_y + 1
    dump = H * W  # out-of-crop cell for culled gaussians (+/- cancel anyway)
    v = pre.visible
    x0, y0 = pre.rect_min[:, 0], pre.rect_min[:, 1]
    x1, y1 = pre.rect_max[:, 0], pre.rect_max[:, 1]
    pos = jnp.concatenate([jnp.where(v, y0 * W + x0, dump),
                           jnp.where(v, y1 * W + x1, dump)])
    neg = jnp.concatenate([jnp.where(v, y0 * W + x1, dump),
                           jnp.where(v, y1 * W + x0, dump)])
    bins = jnp.arange(H * W + 1, dtype=jnp.int32)
    hp = jnp.diff(jnp.searchsorted(jnp.sort(pos), bins))
    hn = jnp.diff(jnp.searchsorted(jnp.sort(neg), bins))
    h2 = (hp - hn).reshape(H, W)
    counts = jnp.cumsum(jnp.cumsum(h2, axis=0), axis=1)[:grid_y, :grid_x]
    return counts.reshape(-1).astype(jnp.int32)      # [T]


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_instances: int, align: int = 128) -> BinningOut:
    P = pre.depths.shape[0]
    num_tiles = grid_x * grid_y
    I = max_instances
    assert I % align == 0, "max_instances must be a multiple of align"

    tiles_touched = pre.tiles_touched
    num_rendered = jnp.sum(tiles_touched)

    # --- per-tile counts + alignment pads (before any instance expansion) --
    counts = _tile_histogram(pre, grid_x, grid_y)          # [T] real counts
    pads = (-counts) % align                               # 0 for empty tiles
    padded = counts + pads
    tile_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    total_padded = num_rendered + jnp.sum(pads)
    overflow = total_padded > I

    # --- virtual pad "gaussians": one per tile, multiplicity pads[t] --------
    # Laid out after the real instances in the unsorted list; the sort puts
    # each tile's pads right behind its real instances (depth = +inf).
    offsets_real = jnp.cumsum(tiles_touched) - tiles_touched        # [P]
    offsets_pad = num_rendered + jnp.cumsum(pads) - pads            # [T]

    # Packed per-source rows: [offset, f0, f1, f2, depth_bits] where for real
    # gaussians (f0,f1,f2) = (rect_min_x, rect_min_y, rect_w) and for pads
    # f0 = flat tile id (f1 unused, f2=1).  One [P+T+1, 5] table keeps the
    # instance expansion a single contiguous row gather.
    depth_bits_g = jax.lax.bitcast_convert_type(
        pre.depths.astype(jnp.float32), jnp.int32)
    gtable_real = jnp.stack(
        [offsets_real, pre.rect_min[:, 0], pre.rect_min[:, 1],
         jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1),
         depth_bits_g], axis=1).astype(jnp.int32)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    gtable_pad = jnp.stack(
        [offsets_pad, tids, jnp.zeros_like(tids), jnp.ones_like(tids),
         jnp.full_like(tids, INF_DEPTH_BITS)], axis=1)
    sentinel = jnp.stack(
        [total_padded.astype(jnp.int32), jnp.int32(0), jnp.int32(0),
         jnp.int32(1), jnp.int32(0)])[None]
    gtable = jnp.concatenate([gtable_real, gtable_pad, sentinel], axis=0)

    # --- expansion: boundary marks + cumsum -> owning source id ------------
    # (~7x faster than jnp.repeat's gather machinery; offsets are a cumsum,
    # i.e. sorted, which XLA's scatter exploits.)
    all_offsets = jnp.concatenate(
        [offsets_real, offsets_pad,
         jnp.minimum(total_padded, I - 1).astype(jnp.int32)[None]])
    # offsets_real <= num_rendered <= offsets_pad <= total_padded, and the
    # clamp preserves monotonicity — the concat is genuinely sorted.
    mark = jnp.zeros((I,), jnp.int32)
    mark = mark.at[jnp.minimum(all_offsets, I - 1)].add(
        1, mode="drop", indices_are_sorted=True)
    src = jnp.cumsum(mark) - 1
    src = jnp.minimum(src, P + num_tiles).astype(jnp.int32)

    rows = gtable[src]                                   # [I,5]
    k = jnp.arange(I, dtype=jnp.int32) - rows[:, 0]
    is_pad = src >= P
    is_tail = src >= P + num_tiles
    rw = rows[:, 3]
    ty = rows[:, 2] + k // rw
    tx = rows[:, 1] + k % rw
    tile = jnp.where(is_pad, rows[:, 1], ty * grid_x + tx)
    tile = jnp.where(is_tail, num_tiles, tile).astype(jnp.int32)
    depth_bits = rows[:, 4]
    gid = jnp.where(is_pad, P, src).astype(jnp.int32)

    tile_s, _, gauss_s = jax.lax.sort(
        (tile, depth_bits, gid), num_keys=2, is_stable=True
    )

    return BinningOut(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_start=tile_start,
        tile_count=counts,
        num_rendered=num_rendered.astype(jnp.int32),
        overflow=overflow,
    )
