"""Naive reference compositor — the forever-oracle for the tiled kernels.

Composites ALL gaussians over ALL pixels with a ``lax.scan`` (O(P * H * W)),
reproducing the CUDA per-pixel loop semantics bit-for-bit
(renderCUDA, forward.cu:261-392):

- front-to-back order by view depth
- a gaussian touches a pixel only if the pixel's 16x16 tile lies inside the
  gaussian's screen rect (that is what tile binning enforces in the real path)
- skip if power > 0, skip if alpha < 1/255, alpha capped at 0.99
- pixel terminates when the *candidate* transmittance would drop below 1e-4
  (the triggering gaussian itself is NOT composited)
- out_color = C + T_final * bg; alpha output is the accumulated weight sum

Differentiable end-to-end with ``jax.grad``; used by tests as the gradient
oracle for the hand-written Pallas VJP (SURVEY.md §4/§7.1).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y, PreprocessOut

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_reference(
    pre: PreprocessOut,
    width: int,
    height: int,
    bg: jnp.ndarray,                      # [3]
    depths_feat: Optional[jnp.ndarray] = None,   # [P] feature composited as depth
    segments: Optional[jnp.ndarray] = None,      # [P, S] activated segment probs
):
    P = pre.depths.shape[0]
    S = 0 if segments is None else segments.shape[1]

    order = jnp.argsort(pre.depths, stable=True)
    means2d = pre.means2d[order]
    conic = pre.conic[order]
    rgb = pre.rgb[order]
    opac = pre.opacity[order]
    visible = pre.visible[order]
    rect_min = pre.rect_min[order]
    rect_max = pre.rect_max[order]
    dfeat = pre.depths[order] if depths_feat is None else depths_feat[order]
    seg = None if segments is None else segments[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    tile_x = (xs / TILE_X).astype(jnp.int32)
    tile_y = (ys / TILE_Y).astype(jnp.int32)

    def body(carry, g):
        T, done, C, D, A, Sacc = carry
        (m2d, con, col, op, vis, rmin, rmax, df, sg) = g
        covered = (
            vis
            & (tile_x >= rmin[0]) & (tile_x < rmax[0])
            & (tile_y >= rmin[1]) & (tile_y < rmax[1])
        )
        dx = m2d[0] - xs
        dy = m2d[1] - ys
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        mask = covered & (power <= 0.0) & (alpha >= ALPHA_MIN) & (~done)
        test_T = T * (1.0 - alpha)
        trigger = mask & (test_T < T_EPS)
        contrib = mask & (~trigger)
        w = jnp.where(contrib, alpha * T, 0.0)
        C = C + w[..., None] * col
        D = D + w * df
        A = A + w
        if sg is not None:
            Sacc = Sacc + w[..., None] * sg
        T = jnp.where(contrib, test_T, T)
        done = done | trigger
        return (T, done, C, D, A, Sacc), None

    init = (
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((height, width), bool),
        jnp.zeros((height, width, 3), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width, max(S, 1)), jnp.float32),
    )
    xs_scan = (means2d, conic, rgb, opac, visible, rect_min, rect_max, dfeat,
               seg if seg is not None else jnp.zeros((P, 1), jnp.float32))
    (T, done, C, D, A, Sacc), _ = jax.lax.scan(body, init, xs_scan)

    out = {
        "render": jnp.transpose(C + T[..., None] * bg, (2, 0, 1)),  # [3,H,W]
        "depth": D,                                                  # [H,W]
        "alpha": A,                                                  # [H,W]
        "T_final": T,
    }
    if segments is not None:
        out["segment"] = jnp.transpose(Sacc, (2, 0, 1))              # [S,H,W]
    return out
