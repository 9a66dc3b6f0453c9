"""Top-level differentiable rasterizer: preprocess -> binning -> composite.

API mirror of the reference's python wrapper
(diff_gaussian_rasterization/__init__.py:21-235 — GaussianRasterizationSettings
/ GaussianRasterizer / rasterize_gaussians) but TPU-native: one jit-able pure
function, fixed-capacity binning, channels composited in a single fused pass
(RGB + depth + alpha + segments), gradients via jax.grad (preprocess/gather)
plus the composite backward.

``means2d_offset`` is the gradient tap replacing the reference's zero
``screenspace_points`` tensor with retain_grad (gaussian_renderer/__init__.py:
304-308): pass zeros [P,2]; grad w.r.t. it is the pixel-space dL/d(mean2d),
which the trainer rescales by (0.5*W, 0.5*H) for densification stats, matching
backward.cu:627-628's NDC scaling.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.ops import binning as binning_lib
from gsplat_tpu.ops import preprocess as pre_lib
from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y


@dataclass(frozen=True)
class RasterizeConfig:
    """Static (compile-time) rasterizer configuration."""
    width: int
    height: int
    sh_degree: int = 3
    num_class: int = 0              # segment channels composited (0 = off)
    max_instances: int = 1 << 20    # tile-instance capacity (binning)
    k_max: int = 1024               # per-tile instance cap (jnp path)
    tile_batch: int = 32            # tiles per lax.map step (jnp path)
    backend: str = "auto"           # "auto" | "jnp" | "pallas" | "reference"
    grad_precision: str = "f32"     # "f32" exact | "bf16" packed-pair grad
                                    # reduce (training fast path, ~0.2% per-
                                    # instance rounding before an exact sum)
    cull: str = "none"              # "exact" drops provably-invisible
                                    # (gaussian, tile) instances (bit-equal
                                    # images, ~17-40% fewer instances)
    max_rows: int = 0               # row-source capacity for cull="exact"
                                    # (0 = max_instances // 2)
    full_width: int = 0             # crop rendering: dims of the FULL camera
    full_height: int = 0            # (0 = width/height); pair with the
                                    # pixel_offset rasterize() kwarg for
                                    # bit-exact tile-sharded slices
    render_only: bool = False       # deployed-renderer fast path: composite
                                    # rgb only (no depth/seg channels; alpha
                                    # = 1 - T_final, mathematically equal to
                                    # the composited ones channel)
    mxu_power: bool = False         # evaluate the per-chunk quadratic form
                                    # on the MXU (tile-relative basis matmul)
                                    # instead of VPU elementwise — see
                                    # composite_pallas._chunk_alpha
    feat_precision: str = "f32"     # "bf16": pack the feature columns
                                    # (rgb/depth/seg) of the gathered attr
                                    # table as bf16 pairs — the <=8-column
                                    # gather class, ~2.5 ms/step at 1080p;
                                    # ~0.4% feature rounding (pallas only)

    @property
    def grid_x(self):
        return (self.width + TILE_X - 1) // TILE_X

    @property
    def grid_y(self):
        return (self.height + TILE_Y - 1) // TILE_Y


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


@partial(jax.jit, static_argnames=("config",))
def rasterize(
    config: RasterizeConfig,
    means3d: jnp.ndarray,                 # [P,3]
    scales: jnp.ndarray,                  # [P,3] activated
    rotations: jnp.ndarray,               # [P,4]
    opacities: jnp.ndarray,               # [P] activated
    shs: Optional[jnp.ndarray],           # [P,K,3]
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    tan_fovx,
    tan_fovy,
    bg: jnp.ndarray,                      # [3]
    segments: Optional[jnp.ndarray] = None,       # [P,S] activated probs
    means2d_offset: Optional[jnp.ndarray] = None, # [P,2] zeros gradient tap
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    clamp_tan_fovx=None,
    clamp_tan_fovy=None,
    pixel_offset=(0, 0),
):
    """Returns dict(render [3,H,W], depth [H,W], alpha [H,W],
    segment [S,H,W]?, radii [P], visibility [P] bool, overflow [], num_rendered [])."""
    pre = pre_lib.preprocess(
        means3d, scales, rotations, opacities, shs,
        config.sh_degree, viewmatrix, projmatrix, campos,
        tan_fovx, tan_fovy, config.width, config.height,
        scale_modifier=scale_modifier,
        cov3d_precomp=cov3d_precomp,
        colors_precomp=colors_precomp,
        clamp_tan_fovx=clamp_tan_fovx,
        clamp_tan_fovy=clamp_tan_fovy,
        full_width=config.full_width or None,
        full_height=config.full_height or None,
        pixel_offset=pixel_offset,
    )
    if means2d_offset is not None:
        pre = pre._replace(means2d=pre.means2d + means2d_offset)

    # Binning is index bookkeeping — no gradients flow through it.  The
    # pallas kernels need CHUNK-aligned per-tile segments (pad-inline sort);
    # the jnp path takes align=1 (no pads).
    backend = _resolve_backend(config.backend)
    pre_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, pre)
    bins = binning_lib.bin_gaussians(
        pre_sg, config.grid_x, config.grid_y, config.max_instances,
        align=128 if backend == "pallas" else 1,
        cull=config.cull, max_rows=config.max_rows,
    )

    # Pack channels: rgb(3) + depth(1) [+ segment(S)] + weight(1).  The
    # constant weight/ones column sits LAST so the pallas path can exclude it
    # from the gathered attribute table (its gradient is discarded — keeping
    # it out of gather_rows' sort+segment-sum adjoint drops one sort operand).
    # render_only: rgb alone (deployed renderer — depth/seg/ones dropped;
    # alpha comes from T_final, which the kernel emits anyway).
    if config.render_only:
        feats = pre.rgb
    else:
        feats = [pre.rgb, pre.depths[:, None]]
        if config.num_class > 0:
            assert segments is not None
            feats.append(segments)
        feats.append(jnp.ones_like(pre.depths[:, None]))
        feats = jnp.concatenate(feats, axis=1)

    overflow = bins.overflow
    if backend == "pallas":
        from gsplat_tpu.ops.composite_pallas import composite_pallas
        chw, T_final, overflow = composite_pallas(
            pre.means2d, pre.conic, pre.opacity, feats, bins,
            config.width, config.height,
            interpret=jax.default_backend() != "tpu",
            const_last_feat=not config.render_only,
            grad_precision=config.grad_precision,
            mxu_power=config.mxu_power,
            feat_precision=config.feat_precision,
        )
    else:
        from gsplat_tpu.ops.composite_tiled import composite_tiled
        img, T_final = composite_tiled(
            pre.means2d, pre.conic, pre.opacity, feats, bins,
            config.width, config.height,
            k_max=config.k_max, tile_batch=config.tile_batch,
        )
        chw = jnp.moveaxis(img, -1, 0)

    render = chw[0:3] + T_final[None] * bg[:, None, None]
    out = {
        "render": render,
        "radii": pre.radii,
        "visibility": pre.visible,
        "overflow": overflow,
        "num_rendered": bins.num_rendered,
        "num_padded": bins.num_padded,
        "T_final": T_final,
    }
    if config.render_only:
        out["alpha"] = 1.0 - T_final
        return out
    out["depth"] = chw[3]
    out["alpha"] = chw[4 + config.num_class]
    if config.num_class > 0:
        out["segment"] = chw[4:4 + config.num_class]
    return out
