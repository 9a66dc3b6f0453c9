"""Tiled compositor, pure-jnp path.

Per 16x16 tile: gather that tile's depth-sorted instance slice (fixed cap
``k_max``), compute the [256 pixels x K instances] alpha matrix, run the
front-to-back recurrence as cumulative products along K, and emit all output
channels with ONE [256,K]x[K,C] matmul (RGB + depth + alpha-weight + segment
channels are packed into a single feature matrix, so the MXU does the
compositing).  Semantics match renderCUDA (forward.cu:261-392) exactly —
including the power>0 / alpha<1/255 skips and the T<1e-4 pixel termination —
see ops/composite_ref.py for the rule-by-rule spec.

This path is fully differentiable with jax.grad (the Pallas path in
ops/composite_pallas.py implements the same math with a hand-derived VJP and
is checked against this one).  Memory is bounded by mapping over tile batches.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.binning import BinningOut
from gsplat_tpu.ops.composite_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y

TILE_PIX = TILE_X * TILE_Y


def _pad_row(x):
    """Append one zero row so the sentinel index P is a safe gather target."""
    pad = [(0, 1)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def compute_tile_weights(pix_xy, xy, conic, opac, valid):
    """The front-to-back recurrence for one tile, vectorized.

    Args:
      pix_xy: [256, 2] pixel centers of this tile.
      xy:     [K, 2] instance means (pixel coords), depth-sorted.
      conic:  [K, 3]; opac: [K]; valid: [K] bool.
    Returns (w [256,K] composite weights, T_final [256]).
    """
    dx = xy[None, :, 0] - pix_xy[:, 0:1]          # [256,K]
    dy = xy[None, :, 1] - pix_xy[:, 1:2]
    power = (
        -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
        - conic[None, :, 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
    mask = valid[None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(mask, alpha, 0.0)

    # Candidate transmittance AFTER instance i is the inclusive cumprod (a=0
    # for masked-out entries, so they don't perturb it).  The pixel terminates
    # at the first instance whose candidate drops below T_EPS; that instance
    # itself is skipped (forward.cu:351-358).  Up to the first trigger the
    # plain cumprod is exact, which is all the trigger search needs.
    T_incl = jnp.cumprod(1.0 - a, axis=1)
    trigger = mask & (T_incl < T_EPS)
    done_incl = jnp.cumsum(trigger.astype(jnp.int32), axis=1) > 0
    contrib = mask & (~done_incl)

    # Recompute T with post-termination instances removed (exact, no /-trick).
    a_eff = jnp.where(contrib, a, 0.0)
    T_incl_eff = jnp.cumprod(1.0 - a_eff, axis=1)
    T_excl_eff = jnp.concatenate(
        [jnp.ones_like(T_incl_eff[:, :1]), T_incl_eff[:, :-1]], axis=1
    )
    w = a_eff * T_excl_eff
    T_final = T_incl_eff[:, -1]
    return w, T_final


@partial(jax.jit, static_argnames=("width", "height", "k_max", "tile_batch"))
def composite_tiled(
    means2d: jnp.ndarray,    # [P,2]
    conic: jnp.ndarray,      # [P,3]
    opacity: jnp.ndarray,    # [P]
    feats: jnp.ndarray,      # [P,C] packed channels (rgb, depth, 1, segment...)
    binning: BinningOut,
    width: int,
    height: int,
    k_max: int = 1024,
    tile_batch: int = 32,
):
    """Returns (out [H, W, C] pre-background, T_final [H, W])."""
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    C = feats.shape[1]

    m2d_p = _pad_row(means2d)
    con_p = _pad_row(conic)
    op_p = _pad_row(opacity)
    ft_p = _pad_row(feats)

    gauss_id = binning.gauss_id
    I = gauss_id.shape[0]

    xs_in_tile = jnp.arange(TILE_X, dtype=jnp.float32)
    ys_in_tile = jnp.arange(TILE_Y, dtype=jnp.float32)
    tyy, txx = jnp.meshgrid(ys_in_tile, xs_in_tile, indexing="ij")
    local_xy = jnp.stack([txx.ravel(), tyy.ravel()], axis=-1)  # [256,2]

    def one_tile(t):
        start = binning.tile_start[t]
        count = jnp.minimum(binning.tile_count[t], k_max)
        ks = jnp.arange(k_max, dtype=jnp.int32)
        idx = jnp.clip(start + ks, 0, I - 1)
        gid = jnp.where(ks < count, gauss_id[idx], m2d_p.shape[0] - 1)
        valid = ks < count

        tx = (t % grid_x).astype(jnp.float32)
        ty = (t // grid_x).astype(jnp.float32)
        pix_xy = local_xy + jnp.stack([tx * TILE_X, ty * TILE_Y])[None, :]

        w, T_final = compute_tile_weights(
            pix_xy, m2d_p[gid], con_p[gid], op_p[gid], valid
        )
        out = jax.lax.dot_general(
            w, ft_p[gid],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [256, C]
        return out, T_final

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    pad_tiles = (-num_tiles) % tile_batch
    tiles = jnp.pad(tiles, (0, pad_tiles))
    tiles = tiles.reshape(-1, tile_batch)

    outs, Ts = jax.lax.map(lambda tb: jax.vmap(one_tile)(tb), tiles)
    outs = outs.reshape(-1, TILE_PIX, C)[:num_tiles]
    Ts = Ts.reshape(-1, TILE_PIX)[:num_tiles]

    # Tile layout -> image, crop padding.
    img = outs.reshape(grid_y, grid_x, TILE_Y, TILE_X, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE_Y, grid_x * TILE_X, C)
    Tf = Ts.reshape(grid_y, grid_x, TILE_Y, TILE_X)
    Tf = Tf.transpose(0, 2, 1, 3).reshape(grid_y * TILE_Y, grid_x * TILE_X)
    return img[:height, :width], Tf[:height, :width]
