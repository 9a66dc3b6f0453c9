"""Per-gaussian preprocessing: frustum cull, projection, EWA 2D covariance,
conic, screen radius, tile rect, SH->RGB.

Behavioral spec: reference forward.cu:74-256 (preprocessCUDA + computeCov2D +
computeCov3D) and auxiliary.h:40-56,137-164 (ndc2Pix, getRect, in_frustum).
This is embarrassingly parallel over P, so it is plain vectorized jnp: XLA
fuses the whole thing into a handful of VPU loops; no hand kernel needed
(SURVEY.md §7.1).  Everything is fp32.

Convention reminder: the view/projection matrices are stored transposed
(row-vector convention), so points transform as ``p_row @ M`` — see
core/cameras.py.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core import transforms as T

# Tile shape.  The reference hardwires 16x16 (config.h:17-18 BLOCK_X/Y,
# bound to the CUDA block size); on TPU the tile is a free design axis —
# the composite kernels, binning and exact-cull geometry all derive from
# these two constants (VERDICT r4 item 3).  Default 32x32: the measured
# end-to-end winner on the real v5e across the 7-shape sweep
# (docs/TILE_AB_r5.json — vs 16x16: +16% fwd+bwd / +40% render on the
# 500k stress scene, +72% fwd+bwd / +76% render on the 30k-trained heavy
# asset, +84/+90% on the capture asset; 1024 px = 8 full VPU sublane
# tiles per composite step amortizes the per-tile scan/DMA overhead, and
# wider tiles cut column-boundary instance duplicates — num_rendered
# 1.61M -> 0.84M on the stress scene.  64x32 is ~8% faster still on
# trained scenes but 14% slower on the dense stress workload; it remains
# an env-selectable tuning point for render-only serving).  Override
# per-process via env (set BEFORE importing gsplat_tpu; every downstream
# module snapshots the values at import): GSPLAT_TILE_X / GSPLAT_TILE_Y.
# Per-pixel output
# is tile-shape independent: a gaussian contributes to a pixel only when
# its footprint covers that pixel, which implies it is binned into the
# pixel's tile under ANY tile shape, and composite order is depth within
# tile — see tests/test_binning.py::test_tile_shape_invariance.
TILE_X = int(os.environ.get("GSPLAT_TILE_X", "32"))
TILE_Y = int(os.environ.get("GSPLAT_TILE_Y", "32"))


class PreprocessOut(NamedTuple):
    depths: jnp.ndarray         # [P] view-space z
    radii: jnp.ndarray          # [P] int32 screen-space radius (0 = culled)
    means2d: jnp.ndarray        # [P,2] pixel coords
    conic: jnp.ndarray          # [P,3] inverse 2D covariance (a,b,c)
    rgb: jnp.ndarray            # [P,3] SH-evaluated color (or override)
    opacity: jnp.ndarray        # [P] activated opacity
    tiles_touched: jnp.ndarray  # [P] int32 count of touched tiles
    rect_min: jnp.ndarray       # [P,2] int32 (tx,ty) inclusive
    rect_max: jnp.ndarray       # [P,2] int32 exclusive
    visible: jnp.ndarray        # [P] bool (radii > 0)


def ndc2pix(v, S):
    """auxiliary.h:40-43."""
    return ((v + 1.0) * S - 1.0) * 0.5


_HI = jax.lax.Precision.HIGHEST


def transform_point_4x3(p, M):
    """p_row @ M, first 3 components (auxiliary.h:57-66).

    Expanded component-wise: a [P,3]x[3,3] dot_general would land on the MXU
    with 3/128-lane utilization; as 9 fused multiply-adds on [P] vectors the
    VPU runs it at full width.
    """
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    out = [x * M[0, j] + y * M[1, j] + z * M[2, j] + M[3, j] for j in range(3)]
    return jnp.stack(out, axis=-1)


def transform_point_4x4(p, M):
    """p_row @ M homogeneous (auxiliary.h:68-77), component-wise."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    out = [x * M[0, j] + y * M[1, j] + z * M[2, j] + M[3, j] for j in range(4)]
    return jnp.stack(out, axis=-1)


def compute_cov2d(means3d, cov3d6, focal_x, focal_y, tan_fovx, tan_fovy,
                  viewmatrix, clamp_tan_fovx=None, clamp_tan_fovy=None):
    """EWA-project 3D covariances to 2D (forward.cu:74-113).

    Returns [P,3] packed (cov_xx, cov_xy, cov_yy) with the +0.3 low-pass.
    ``clamp_tan_*`` decouple the 1.3*tanfov Jacobian clamp from the focal
    (needed by tile-sharded crop rendering, parallel/tile_parallel.py).
    """
    t = transform_point_4x3(means3d, viewmatrix)  # [P,3] view-space
    limx = 1.3 * (tan_fovx if clamp_tan_fovx is None else clamp_tan_fovx)
    limy = 1.3 * (tan_fovy if clamp_tan_fovy is None else clamp_tan_fovy)
    tz = t[:, 2]
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # Fully component-wise EWA (forward.cu:74-113). J has only 4 nonzero
    # entries, so T = W @ J has columns:
    #   T[:,0] = W[:,0] * (fx/tz)
    #   T[:,1] = W[:,1] * (fy/tz)
    #   T[:,2] = W[:,0] * (-fx tx/tz^2) + W[:,1] * (-fy ty/tz^2)
    # and cov2d[a,b] = T[:,a]^T Vrk T[:,b] over the first two columns only.
    W = viewmatrix[:3, :3]
    j00 = focal_x / tz
    j11 = focal_y / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j12 = -(focal_y * ty) / (tz * tz)

    # column vectors of T as [P] component arrays
    t0 = [W[i, 0] * j00 + W[i, 2] * j02 for i in range(3)]
    t1 = [W[i, 1] * j11 + W[i, 2] * j12 for i in range(3)]

    v_xx, v_xy, v_xz = cov3d6[:, 0], cov3d6[:, 1], cov3d6[:, 2]
    v_yy, v_yz, v_zz = cov3d6[:, 3], cov3d6[:, 4], cov3d6[:, 5]

    def vrk_dot(a, b):
        # a^T Vrk b with symmetric Vrk, expanded
        return (a[0] * (v_xx * b[0] + v_xy * b[1] + v_xz * b[2])
                + a[1] * (v_xy * b[0] + v_yy * b[1] + v_yz * b[2])
                + a[2] * (v_xz * b[0] + v_yz * b[1] + v_zz * b[2]))

    cov_xx = vrk_dot(t0, t0) + 0.3
    cov_xy = vrk_dot(t0, t1)
    cov_yy = vrk_dot(t1, t1) + 0.3
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,            # [P,3]
    scales: jnp.ndarray,             # [P,3] activated (exp applied)
    rotations: jnp.ndarray,          # [P,4] raw quaternions
    opacities: jnp.ndarray,          # [P] activated (sigmoid applied)
    shs: Optional[jnp.ndarray],      # [P,K,3] or None
    sh_degree: int,
    viewmatrix: jnp.ndarray,         # [4,4] transposed W2V
    projmatrix: jnp.ndarray,         # [4,4] transposed full projection
    campos: jnp.ndarray,             # [3]
    tan_fovx,
    tan_fovy,
    width: int,
    height: int,
    scale_modifier: float = 1.0,
    cov3d_precomp: Optional[jnp.ndarray] = None,   # [P,6]
    colors_precomp: Optional[jnp.ndarray] = None,  # [P,3]
    clamp_tan_fovx=None,
    clamp_tan_fovy=None,
    full_width: Optional[int] = None,
    full_height: Optional[int] = None,
    pixel_offset=(0, 0),
) -> PreprocessOut:
    """``full_width/full_height`` + ``pixel_offset``: render a (width, height)
    crop of a larger (full_width, full_height) camera in FULL-IMAGE pixel
    space — focal, ndc2pix and the projection all use the full dims, then
    pixel coordinates shift by the (traced-ok) integer offset.  Because the
    offset subtraction is exact in fp32 and tile rects shift consistently
    (offset must be a multiple of TILE_X/TILE_Y), a crop render is
    BIT-IDENTICAL to the full render restricted to the crop — the basis of
    tile-sharded rendering (parallel/tile_parallel.py)."""
    P = means3d.shape[0]
    fw = width if full_width is None else full_width
    fh = height if full_height is None else full_height
    focal_y = fh / (2.0 * tan_fovy)   # rasterizer_impl.cu:226-227
    focal_x = fw / (2.0 * tan_fovx)

    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y

    # Frustum cull (auxiliary.h:137-164): view z > 0.2 required.
    p_view = transform_point_4x3(means3d, viewmatrix)
    in_frustum = p_view[:, 2] > 0.2

    # Project (forward.cu:197-200).
    p_hom = transform_point_4x4(means3d, projmatrix)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    # 3D covariance.
    if cov3d_precomp is not None:
        cov3d6 = cov3d_precomp
    else:
        cov3d6 = T.covariance_from_scaling_rotation(scales, scale_modifier, rotations)

    # 2D covariance -> conic (forward.cu:219-227).
    cov2d = compute_cov2d(
        means3d, cov3d6, focal_x, focal_y, tan_fovx, tan_fovy, viewmatrix,
        clamp_tan_fovx, clamp_tan_fovy,
    )
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv],
        axis=-1,
    )

    # Screen-space radius from max eigenvalue (forward.cu:229-233).
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam2 = mid - jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, lam2)))

    point_image = jnp.stack(
        [ndc2pix(p_proj[:, 0], fw) - pixel_offset[0],
         ndc2pix(p_proj[:, 1], fh) - pixel_offset[1]], axis=-1
    )

    # Tile rect (auxiliary.h:45-56). Note: float-divide then int-trunc like CUDA.
    #
    # TPU refinement over the CUDA 3*sqrt(lambda_max) square: opacity-aware
    # per-axis extents.  The composite kernel skips any pixel with
    # alpha = op*exp(power) < 1/255 (forward.cu:351-358), and the marginal
    # bound d^T Sigma^-1 d >= dx^2 / Sigma_xx gives
    # alpha <= op * exp(-dx^2 / (2 Sigma_xx)); so every pixel with
    # |dx| > sqrt(2 Sigma_xx ln(255 op)) is skipped no matter its dy.  Tiles
    # outside the (ext_x, ext_y) band therefore contribute EXACTLY nothing
    # (they never pass the alpha test, and skipped pixels leave T and the
    # termination untouched) — dropping them changes no output bit while
    # cutting the instance count ~2x, which all of binning/sort/gather/
    # composite scale with.  The 1e-3 slack absorbs fp32 rounding in the
    # kernel's power evaluation and the +1 pixel covers the rect formula's
    # truncation at the band edge; extents are capped at the CUDA radius so
    # the rect stays a subset of the reference's (where the cap binds, the
    # truncation behavior is bit-identical to getRect's).
    ln_op = jnp.log(jnp.maximum(255.0 * opacities, 1.0))  # 0 when op<=1/255
    ext_x = jnp.minimum(radius, jnp.sqrt(2.0 * cov2d[:, 0] * (ln_op + 1e-3)) + 1.0)
    ext_y = jnp.minimum(radius, jnp.sqrt(2.0 * cov2d[:, 2] * (ln_op + 1e-3)) + 1.0)
    rect_min_x = jnp.clip(((point_image[:, 0] - ext_x) / TILE_X).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((point_image[:, 1] - ext_y) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(((point_image[:, 0] + ext_x + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(((point_image[:, 1] + ext_y + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, grid_y)
    tiles = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)

    valid = in_frustum & det_ok & (tiles > 0)
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles, 0).astype(jnp.int32)

    # Color (forward.cu:238-246).
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = sh_lib.sh_to_rgb(sh_degree, shs, means3d, campos)

    return PreprocessOut(
        depths=p_view[:, 2],
        radii=radii,
        means2d=point_image,
        conic=conic,
        rgb=rgb,
        opacity=opacities,
        tiles_touched=tiles_touched,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        visible=valid,
    )
