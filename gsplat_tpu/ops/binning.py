"""Tile binning: duplicate gaussians per touched tile, sort by (tile, depth),
find per-tile ranges — with CHUNK-ALIGNED per-tile segments.

Behavioral spec: reference rasterizer_impl.cu:70-138,279-322 (duplicateWithKeys
+ CUB radix SortPairs + identifyTileRanges).  TPU-native redesign:

- The CUDA path reads back the instance count to the host to size buffers
  (rasterizer_impl.cu:283-289) — a forced device sync.  Here everything is
  FIXED CAPACITY (``max_instances``) so the whole step stays inside one jit
  (SURVEY.md §7.1); overflow is detected and reported, never crashes.
- The 64-bit key radix sort becomes DEPTH-MAJOR EXPANSION + a single-key
  stable tile sort: gaussians are argsorted by view depth FIRST (P rows —
  5-10x fewer than instances), instances are expanded in that order, and one
  stable ``jax.lax.sort`` on the tile id alone finishes the (tile, depth)
  ordering — stability preserves the within-tile depth order the expansion
  already established.  Positive-float bit patterns sort identically to their
  values (the CUDA key-packing trick, rasterizer_impl.cu:70-111), so the
  depth argsort runs on int32 bits.
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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.pallas_util import vma_of

from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y, PreprocessOut

INF_DEPTH_BITS = 0x7F800000  # +inf float bits: sorts after every real depth


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray     # [I] int32 sorted gaussian index (P = pad/sentinel)
    tile_id: jnp.ndarray      # [I] int32 sorted tile index (num_tiles = pad)
    tile_start: jnp.ndarray   # [T] int32 ALIGN-aligned start offset per tile
    tile_count: jnp.ndarray   # [T] int32 REAL instances per tile (pads excluded)
    num_rendered: jnp.ndarray # [] int32 true instance count (may exceed capacity)
    num_padded: jnp.ndarray   # [] int32 true PADDED demand (instances +
                              # per-tile alignment pads) — what capacity
                              # sizing must actually cover
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


_EXP_CH = 1024   # instance positions per expansion-kernel program
_EXP_W = 128     # sources per window pass


def _expand_kernel(rw_bits: int, grid_x: int, num_tiles: int, n_extra: int,
                   ranges_ref, src_ref, out_ref, win, sems):
    """Forward-fill expansion without scatters: for each of CH consecutive
    instance positions, the owning source is the LAST source with
    offset <= pos.  Window passes of 128 sources compute the per-lane
    dominance count (compare + sublane tree-sum) and select the owner row
    with a one-hot MXU matmul — exact for the integer rows (one nonzero
    term per output, every value < 2^24) AND for arbitrary f32 extras (the
    single product value*1.0 is exact at HIGHEST precision).

    ``n_extra`` > 0 additionally forwards that many source attribute rows
    and switches the output to [16, CH] f32 (rows: tile, gid, extras...)."""
    c = pl.program_id(0)
    w0blk = ranges_ref[c % 8, 0]     # first 128-aligned source window
    npass = ranges_ref[c % 8, 1]

    def dma(slot, p):
        return pltpu.make_async_copy(src_ref.at[w0blk + p],
                                     win.at[slot], sems.at[slot])

    dma(0, 0).start()

    pos = (c * _EXP_CH +
           jax.lax.broadcasted_iota(jnp.int32, (1, _EXP_CH), 1)
           ).astype(jnp.float32)
    k_io = jax.lax.broadcasted_iota(
        jnp.int32, (_EXP_W, 1), 0).astype(jnp.float32)
    n_sel = 3 + n_extra

    def body(p, acc):
        slot = p % 2

        @pl.when(p + 1 < npass)
        def _():
            dma((p + 1) % 2, p + 1).start()

        dma(slot, p).wait()
        off = win[slot, 0][:, None]                      # [W,1]
        cmp = (off <= pos).astype(jnp.float32)           # [W,CH]
        # (an MXU ones-matmul for this count measured ~1 ms SLOWER end to
        # end than the sublane tree — the cmp relayout outweighs the saved
        # shift+adds, the same pattern as the mxu moment-basis experiments)
        cnt = jnp.sum(cmp, axis=0, keepdims=True)        # [1,CH] exact <=128
        onehot = (k_io == (cnt - 1.0)).astype(jnp.float32)
        sel = jax.lax.dot_general(win[slot, 0:n_sel], onehot,
                                  (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST)
        return jnp.where(cnt > 0.0, sel, acc)

    acc = jax.lax.fori_loop(0, npass, body,
                            jnp.zeros((n_sel, _EXP_CH), jnp.float32))

    # decode (offs, meta, gid) -> (tile, gid); integer div for exactness
    k = (pos - acc[0:1]).astype(jnp.int32)               # [1,CH]
    meta = acc[1:2].astype(jnp.int32)
    gid = acc[2:3].astype(jnp.int32)
    colstep = meta & 1
    rw = (meta >> 1) & ((1 << rw_bits) - 1)
    base = meta >> (rw_bits + 1)
    q = k // rw
    tile = base + q * grid_x + (k - q * rw) * colstep
    tile = jnp.minimum(tile, num_tiles)
    if n_extra:
        out_ref[0] = jnp.concatenate(
            [tile.astype(jnp.float32), gid.astype(jnp.float32),
             acc[3:3 + n_extra],
             jnp.zeros((16 - 2 - n_extra, _EXP_CH), jnp.float32)], axis=0)
    else:
        out_ref[0] = jnp.concatenate(
            [tile, gid, jnp.zeros((6, _EXP_CH), jnp.int32)], axis=0)


def _expand_pallas(all_offsets, all_meta, all_gid, I: int, rw_bits: int,
                   grid_x: int, num_tiles: int, interpret: bool,
                   extras=()):
    """Pallas replacement for the scatter+cumsum forward-fill (three ~4.4 ms
    XLA scatters + a 5 ms multi-column cumsum + decode at 2.5M instances
    become one ~3 ms kernel + a small searchsorted).

    ``extras``: optional per-source f32 rows forwarded verbatim to every
    owned position (returned as a [n_extra, I] f32 array after tile/gid)."""
    S = all_offsets.shape[0]
    n_extra = len(extras)
    rows_cap = 8 if n_extra == 0 else 16
    assert 3 + n_extra <= rows_cap
    Sp = ((S + _EXP_W - 1) // _EXP_W) * _EXP_W
    src = jnp.stack([
        jnp.pad(all_offsets.astype(jnp.float32), (0, Sp - S),
                constant_values=1 << 25),
        jnp.pad(all_meta.astype(jnp.float32), (0, Sp - S)),
        jnp.pad(all_gid.astype(jnp.float32), (0, Sp - S)),
    ] + [jnp.pad(e.astype(jnp.float32), (0, Sp - S)) for e in extras])
    src = jnp.pad(src, ((0, rows_cap - 3 - n_extra), (0, 0)))
    src = src.reshape(rows_cap, Sp // _EXP_W, _EXP_W).swapaxes(0, 1)

    assert I % _EXP_CH == 0
    NP = I // _EXP_CH
    qs = jnp.arange(NP + 1, dtype=jnp.int32) * _EXP_CH
    s0 = jnp.clip(jnp.searchsorted(all_offsets, qs[:-1], side="right") - 1,
                  0, S - 1).astype(jnp.int32)
    s1 = jnp.searchsorted(all_offsets, qs[1:], side="left").astype(jnp.int32)
    w0blk = s0 // _EXP_W
    npass = (jnp.maximum(s1, s0 + 1) - w0blk * _EXP_W
             + _EXP_W - 1) // _EXP_W
    ranges = jnp.stack([w0blk, npass], axis=1)
    pad_rows = (-NP) % 8
    if pad_rows:
        ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))

    kernel = functools.partial(_expand_kernel, rw_bits, grid_x, num_tiles,
                               n_extra)
    out_dtype = jnp.int32 if n_extra == 0 else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((8, 2), lambda c: (c // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rows_cap, _EXP_CH), lambda c: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows_cap, _EXP_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((NP, rows_cap, _EXP_CH), out_dtype,
                                       vma=vma_of(ranges, src)),
        interpret=interpret,
    )(ranges, src)
    if n_extra == 0:
        return out[:, 0].reshape(-1), out[:, 1].reshape(-1)
    return (out[:, 0].reshape(-1).astype(jnp.int32),
            out[:, 1].reshape(-1).astype(jnp.int32),
            out[:, 2:2 + n_extra].transpose(1, 0, 2).reshape(n_extra, -1))


def _meta_layout(grid_x: int, num_tiles: int, align: int):
    rw_cap = max(grid_x, align, 2)
    rw_bits = int(rw_cap).bit_length()
    base_bits = int(num_tiles).bit_length()
    assert 1 + rw_bits + base_bits <= 31, "tile grid too large for packed meta"

    def pack_meta(base, rw, colstep):
        return ((base << (rw_bits + 1)) | (rw << 1) | colstep).astype(jnp.int32)

    return rw_cap, rw_bits, base_bits, pack_meta


def _bin_gaussians_culled(pre: PreprocessOut, grid_x: int, grid_y: int,
                          I: int, align: int, order, max_rows: int
                          ) -> BinningOut:
    """Two-stage expansion with exact ellipse-vs-tile culling.

    Stage A expands gaussians into (gaussian, tile-row) sources via the same
    windowed kernel (row index rides the walk's k, extras carry the f32
    attributes).  Per row band the survivor tile columns form a CONTIGUOUS
    x-range (convexity of the sublevel set {q <= tau}), computed in closed
    form from the projection of ellipse-intersect-band; the per-tile
    histogram deposits +-1 at the clipped row endpoints, and stage B runs
    the standard expansion over the row sources with clipped widths."""
    P = pre.depths.shape[0]
    num_tiles = grid_x * grid_y
    rw_cap, rw_bits, _, pack_meta = _meta_layout(grid_x, num_tiles, align)
    interpret = jax.default_backend() != "tpu"
    IR = max_rows if max_rows > 0 else max(_EXP_CH, I // 2)
    IR = ((IR + _EXP_CH - 1) // _EXP_CH) * _EXP_CH
    assert P < (1 << 24) and I < (1 << 24)

    # ---- stage A: (gaussian -> tile-row) sources, depth order -------------
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)
    rh = jnp.where(pre.visible, rect_h, 0).astype(jnp.int32)
    tau = jnp.log(jnp.maximum(255.0 * pre.opacity, 1e-6)) + 1e-3

    gtab = jnp.concatenate([
        rh[:, None].astype(jnp.float32),
        pre.rect_min[:, 1][:, None].astype(jnp.float32),
        pre.means2d, pre.conic, tau[:, None],
        pre.rect_min[:, 0][:, None].astype(jnp.float32),
        rect_w[:, None].astype(jnp.float32),
    ], axis=1)[order]                                      # [P, 10]
    rh_s = gtab[:, 0].astype(jnp.int32)
    rows_total = jnp.sum(rh_s)
    row_offsets = jnp.cumsum(rh_s) - rh_s
    # row walk: base = rect_min_y, rw = rw_cap (so k // rw == 0) -> ty=y0+k
    metaA = pack_meta(gtab[:, 1].astype(jnp.int32),
                      jnp.full((P,), rw_cap, jnp.int32),
                      jnp.ones((P,), jnp.int32))
    offA = jnp.concatenate([row_offsets.astype(jnp.int32),
                            rows_total.astype(jnp.int32)[None]])
    metaA_all = jnp.concatenate(
        [metaA, pack_meta(jnp.int32(grid_y), jnp.int32(rw_cap),
                          jnp.int32(0))[None]])
    gidA = jnp.concatenate([order, jnp.full((1,), P, jnp.int32)])
    extras = tuple(jnp.concatenate([gtab[:, j], jnp.zeros((1,))])
                   for j in range(2, 10))
    ty_r, gid_r, ext = _expand_pallas(
        offA, metaA_all, gidA, IR, rw_bits, grid_x, grid_y,
        interpret, extras=extras)
    mx, my, ca, cb, cc, tau_r, rx0, rwg = (ext[j] for j in range(8))

    # ---- exact per-row x-range (projection of ellipse ∩ row band) ---------
    ca_g = jnp.maximum(ca, 1e-12)
    cc_g = jnp.maximum(cc, 1e-12)
    tyf = ty_r.astype(jnp.float32)
    l = float(TILE_Y) * tyf - my
    h = l + float(TILE_Y - 1)
    abar = jnp.maximum(ca_g - cb * cb / cc_g, 1e-12)
    cbar = jnp.maximum(cc_g - cb * cb / ca_g, 1e-12)
    dyc = jnp.clip(0.0, l, h)
    nonempty = 0.5 * cbar * dyc * dyc <= tau_r
    dx_e = jnp.sqrt(2.0 * jnp.maximum(tau_r, 0.0) / abar)

    def edge_root(e, sign):
        disc = jnp.maximum(
            cb * cb * e * e - ca_g * (cc_g * e * e - 2.0 * tau_r), 0.0)
        return (-cb * e + sign * jnp.sqrt(disc)) / ca_g

    dy_hi = -cb * dx_e / cc_g
    dx_hi = jnp.where((dy_hi >= l) & (dy_hi <= h), dx_e,
                      edge_root(jnp.where(dy_hi < l, l, h), 1.0))
    dy_lo = cb * dx_e / cc_g
    dx_lo = jnp.where((dy_lo >= l) & (dy_lo <= h), -dx_e,
                      edge_root(jnp.where(dy_lo < l, l, h), -1.0))
    X_lo = jnp.maximum(
        jnp.ceil((mx + dx_lo - float(TILE_X - 1)) / float(TILE_X)), rx0)
    X_hi = jnp.minimum(jnp.floor((mx + dx_hi) / float(TILE_X)),
                       rx0 + rwg - 1.0)
    widthf = jnp.where(nonempty & (gid_r < P), X_hi - X_lo + 1.0, 0.0)
    width = jnp.maximum(widthf, 0.0).astype(jnp.int32)
    X_lo_i = jnp.where(width > 0, X_lo.astype(jnp.int32), 0)

    # ---- per-tile survivor counts: row-range difference histogram ---------
    W2 = grid_x + 1
    dump = grid_y * W2
    posR = jnp.where(width > 0, ty_r * W2 + X_lo_i, dump)
    negR = jnp.where(width > 0, ty_r * W2 + X_lo_i + width, dump)
    binsR = jnp.arange(grid_y * W2 + 1, dtype=jnp.int32)
    hp = jnp.diff(jnp.searchsorted(jnp.sort(posR), binsR))
    hn = jnp.diff(jnp.searchsorted(jnp.sort(negR), binsR))
    counts = jnp.cumsum((hp - hn).reshape(grid_y, W2), axis=1)[:, :grid_x]
    counts = counts.reshape(-1).astype(jnp.int32)          # [T]

    pads = (-counts) % align
    padded = counts + pads
    tile_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    num_rendered = jnp.sum(width)
    total_padded = num_rendered + jnp.sum(pads)
    overflow = (total_padded > I) | (rows_total > IR)

    # ---- stage B: standard expansion over the clipped row sources ---------
    offB = jnp.cumsum(width) - width
    metaB = pack_meta(ty_r * grid_x + X_lo_i, jnp.maximum(width, 1),
                      jnp.ones_like(width))
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    meta_pad = pack_meta(tids, jnp.full_like(tids, align if align > 1 else 1),
                         jnp.zeros_like(tids))
    meta_tail = pack_meta(jnp.int32(num_tiles), jnp.int32(rw_cap),
                          jnp.int32(0))[None]
    offsets_pad = num_rendered + jnp.cumsum(pads) - pads
    all_offsets = jnp.concatenate(
        [offB.astype(jnp.int32), offsets_pad.astype(jnp.int32),
         total_padded.astype(jnp.int32)[None]])
    all_meta = jnp.concatenate([metaB, meta_pad, meta_tail])
    all_gid = jnp.concatenate([gid_r, jnp.full((num_tiles + 1,), P,
                                               jnp.int32)])
    tile, gid = _expand_pallas(all_offsets, all_meta, all_gid, I, rw_bits,
                               grid_x, num_tiles, interpret)
    tile_s, gauss_s = jax.lax.sort((tile, gid), num_keys=1, is_stable=True)

    return BinningOut(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_start=tile_start,
        tile_count=counts,
        num_rendered=num_rendered.astype(jnp.int32),
        num_padded=total_padded.astype(jnp.int32),
        overflow=overflow,
    )


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_instances: int, align: int = 128,
                  expand_impl: str = "auto", cull: str = "none",
                  max_rows: int = 0) -> BinningOut:
    """``cull="exact"`` drops every (gaussian, tile) instance whose ellipse
    {q <= ln(255*op)} provably misses the tile — bit-identical output (the
    composite kernel skips all pixels of such instances anyway) with
    ~17-40% fewer instances (tools/estimate_ellipse_cull.py); needs the
    pallas expansion path and a row-source capacity ``max_rows``."""
    P = pre.depths.shape[0]
    num_tiles = grid_x * grid_y
    I = max_instances
    assert I % align == 0, "max_instances must be a multiple of align"

    tiles_touched = pre.tiles_touched
    num_rendered = jnp.sum(tiles_touched)

    # --- depth-major gaussian order (see module doc): argsort P gaussians by
    # view-depth bits, expand instances in that order, so the final sort
    # needs only the tile key.  Invisible gaussians sort last (0 instances).
    depth_bits_g = jax.lax.bitcast_convert_type(
        pre.depths.astype(jnp.float32), jnp.int32)
    dkey = jnp.where(pre.visible, depth_bits_g, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(dkey, stable=True).astype(jnp.int32)        # [P]

    if cull == "exact":
        return _bin_gaussians_culled(pre, grid_x, grid_y, I, align, order,
                                     max_rows)

    # --- per-tile counts + alignment pads (before any instance expansion) --
    counts = _tile_histogram(pre, grid_x, grid_y)          # [T] real counts
    pads = (-counts) % align                               # 0 for empty tiles
    padded = counts + pads
    tile_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    total_padded = num_rendered + jnp.sum(pads)
    overflow = total_padded > I

    src_tbl = jnp.stack(
        [tiles_touched, pre.rect_min[:, 0], pre.rect_min[:, 1],
         jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)],
        axis=1).astype(jnp.int32)[order]                            # [P,4]
    tt_s = src_tbl[:, 0]
    offsets_real = jnp.cumsum(tt_s) - tt_s                          # [P]
    offsets_pad = num_rendered + jnp.cumsum(pads) - pads            # [T]

    # --- expansion WITHOUT a per-instance gather ----------------------------
    # Per-source values are forward-filled into the [I] instance axis by
    # scattering telescoping DELTAS at each source's first-instance offset and
    # taking a cumsum ("diff array" in 1D): since every segment is contiguous
    # and consecutive deltas at a shared offset (zero-instance sources) sum
    # away, cumsum reconstructs the owning source's value at every instance.
    # This replaces the old gtable[src] row gather — at ~7ns/row a 2.5M-row
    # gather was the single biggest binning cost.
    #
    # Three filled columns: the owning source's first-instance offset (gives
    # k = i - offset), a bit-packed (tile_base, rect_w, colstep) meta word,
    # and the original gaussian id.  One shared unified formula
    #   tile = base + (k // rw) * grid_x + (k % rw) * colstep
    # covers all source types: real (base = ty0*grid_x+tx0, rw = rect width,
    # colstep = 1), per-tile pads (base = tile id, rw = align > max pad
    # count, colstep = 0), and the tail sentinel (base = num_tiles, any rw).
    rw_cap = max(grid_x, align, 2)
    rw_bits = int(rw_cap).bit_length()
    base_bits = int(num_tiles).bit_length()
    assert 1 + rw_bits + base_bits <= 31, "tile grid too large for packed meta"
    # f32 forward-fill is exact only while every filled value fits in f32's
    # 24-bit integer range (values telescope, partial sums never exceed them)
    exact_f32 = (1 + rw_bits + base_bits <= 24 and P < (1 << 24)
                 and I < (1 << 24))

    def pack_meta(base, rw, colstep):
        return ((base << (rw_bits + 1)) | (rw << 1) | colstep).astype(jnp.int32)

    base_real = src_tbl[:, 2] * grid_x + src_tbl[:, 1]
    meta_real = pack_meta(base_real, src_tbl[:, 3], jnp.ones_like(base_real))
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    meta_pad = pack_meta(tids, jnp.full_like(tids, align if align > 1 else 1),
                         jnp.zeros_like(tids))
    meta_tail = pack_meta(jnp.int32(num_tiles), jnp.int32(rw_cap),
                          jnp.int32(0))[None]

    all_offsets = jnp.concatenate(
        [offsets_real, offsets_pad, total_padded.astype(jnp.int32)[None]])
    all_meta = jnp.concatenate([meta_real, meta_pad, meta_tail])
    all_gid = jnp.concatenate(
        [order, jnp.full((num_tiles + 1,), P, jnp.int32)])
    if expand_impl == "auto":
        expand_impl = ("pallas" if (exact_f32 and I % _EXP_CH == 0
                                    and jax.default_backend() == "tpu")
                       else "xla")

    if expand_impl == "pallas":
        assert exact_f32, "pallas expansion needs f32-exact packed values"
        tile, gid = _expand_pallas(
            all_offsets, all_meta, all_gid, I, rw_bits, grid_x, num_tiles,
            interpret=jax.default_backend() != "tpu")
    else:
        # offsets_real <= num_rendered <= offsets_pad <= total_padded: the
        # concat is genuinely sorted, which XLA's scatter exploits.
        pos = jnp.minimum(all_offsets, I - 1)

        def deltas_of(vals):
            return jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])

        dt = jnp.float32 if exact_f32 else jnp.int32

        def seed_col(vals):
            # deltas scattered as f32 when exact: every delta and every
            # cumsum partial sum telescopes back to an original value < 2^24,
            # so f32 adds are EXACT — and f32 scans run ~1.6x faster than i32
            return jnp.zeros((I,), dt).at[pos].add(
                deltas_of(vals).astype(dt), mode="drop",
                indices_are_sorted=True)

        # Three separate 1-column scatters (measured alternatives, all WORSE
        # on TPU: one [n,3]-row packed scatter 2.4x slower — multi-lane
        # scatter rows collapse XLA's per-row throughput; complex64 ~5x
        # slower), but ONE BATCHED [I,3] axis-0 cumsum: a 3-lane scan costs
        # the same as a 1-column scan (4.5 vs 3x5.2 ms at 2.5M).
        seeds = jnp.stack(
            [seed_col(all_offsets), seed_col(all_meta), seed_col(all_gid)],
            axis=1)
        filled = jnp.cumsum(seeds, axis=0).astype(jnp.int32)
        offs, meta, gid = filled[:, 0], filled[:, 1], filled[:, 2]

        k = jnp.arange(I, dtype=jnp.int32) - offs
        colstep = meta & 1
        rw = (meta >> 1) & ((1 << rw_bits) - 1)
        base = meta >> (rw_bits + 1)
        tile = base + (k // rw) * grid_x + (k % rw) * colstep
        tile = jnp.minimum(tile, num_tiles).astype(jnp.int32)

    # Instances are already in depth order (depth-major expansion) and pads
    # already follow every real instance (offsets_pad >= num_rendered), so a
    # single-key STABLE tile sort completes the (tile, depth, pads-last)
    # ordering — half the comparator work and one fewer permuted operand than
    # the two-key (tile, depth_bits) sort.
    tile_s, gauss_s = jax.lax.sort((tile, gid), num_keys=1, is_stable=True)

    return BinningOut(
        gauss_id=gauss_s,
        tile_id=tile_s,
        tile_start=tile_start,
        tile_count=counts,
        num_rendered=num_rendered.astype(jnp.int32),
        num_padded=total_padded.astype(jnp.int32),
        overflow=overflow,
    )
