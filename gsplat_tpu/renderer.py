"""Public render() API — mirror of reference gaussian_renderer/__init__.py:203-391.

Takes a Camera/MiniCam + GaussianModel and returns the same dict the
reference render() returns: {render, viewspace_points, visibility_filter,
radii, depth, alpha, segment} — with ``depth`` max-normalized exactly like
the reference (:375) and the raw composited depth additionally exposed as
``depth_raw``.  ``bbox_mask`` reproduces the visualizer's crop path
(:211-300) by suppressing masked-out gaussians; ``rgb_factors`` applies the
appearance-embedding color correction (:377-381).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import transforms as T
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize


# (P, W, H) -> largest instance capacity measured this session.  Binning,
# gather and sort all scale with the fixed capacity, so the static P*8
# guess costs ~15% of a frame; instead measure the actual instance demand
# (preprocess is ~0.5 ms) and bucket the capacity so recompiles stay rare.
_capacity_cache: dict = {}


@functools.partial(jax.jit, static_argnames=("W", "H"))
def _count_instances(xyz, scaling, rotation, opacity, viewmatrix,
                     projmatrix, campos, tan_fovx, tan_fovy,
                     scale_modifier, W: int, H: int):
    from gsplat_tpu.ops import preprocess as pre_lib
    pre = pre_lib.preprocess(
        xyz, T.scaling_activation(scaling), rotation,
        T.opacity_activation(opacity[:, 0]), None, 0,
        viewmatrix, projmatrix, campos, tan_fovx, tan_fovy, W, H,
        scale_modifier=scale_modifier,
        colors_precomp=jnp.zeros((xyz.shape[0], 3)))
    return jnp.sum(pre.tiles_touched)


def _auto_capacity(cam, pc, W: int, H: int, scaling_modifier: float) -> int:
    # Measure instance demand once per (P, W, H); later frames of the same
    # shape reuse the cached capacity (one readback per key, no per-frame
    # device sync, and _count_instances is a module-level jit so there is
    # exactly one compile per shape).
    key = (pc.params.xyz.shape[0], W, H)
    if key in _capacity_cache:
        return _capacity_cache[key]
    nr = int(_count_instances(
        pc.params.xyz, pc.params.scaling, pc.params.rotation,
        pc.params.opacity,
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy),
        jnp.float32(scaling_modifier), W, H))
    pads = 64 * ((W + 15) // 16) * ((H + 15) // 16)
    blk = 1 << 17
    # 1.6x headroom: later frames of the same scene skip re-measurement,
    # so leave margin for view-dependent variation (overflow flag remains
    # the correctness guard for pathological cases)
    cap = max(1 << 18, (int(nr * 1.6) + pads + blk - 1) // blk * blk)
    _capacity_cache[key] = cap
    return cap


def render(
    viewpoint_camera,
    pc: GaussianModel,
    bg_color=None,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    bbox_mask: Optional[jnp.ndarray] = None,
    rgb_factors: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    max_instances: int = 0,
    means2d_offset: Optional[jnp.ndarray] = None,
    active_sh_degree: Optional[int] = None,
    convert_SHs_python: bool = False,
    compute_cov3D_python: bool = False,
):
    bg = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)
    W = int(viewpoint_camera.image_width)
    H = int(viewpoint_camera.image_height)
    P = pc.params.xyz.shape[0]
    if max_instances <= 0:
        max_instances = _auto_capacity(viewpoint_camera, pc, W, H,
                                       scaling_modifier)

    cfg = RasterizeConfig(
        width=W, height=H, sh_degree=(pc.active_sh_degree
                                      if active_sh_degree is None
                                      else active_sh_degree),
        num_class=pc.num_class, max_instances=max_instances, backend=backend,
    )
    opac = T.opacity_activation(pc.params.opacity[:, 0])
    if bbox_mask is not None:
        opac = jnp.where(jnp.asarray(bbox_mask), opac, 0.0)

    # pipe.convert_SHs_python / pipe.compute_cov3D_python: compute SH->RGB
    # and the 3D covariance in the python/jnp oracle path and feed them to
    # the rasterizer as precomputed inputs, exactly like the reference's
    # debug backends (gaussian_renderer/__init__.py:341-359)
    cov3d_precomp = None
    if compute_cov3D_python:
        cov3d_precomp = T.covariance_from_scaling_rotation(
            T.scaling_activation(pc.params.scaling), scaling_modifier,
            pc.params.rotation)
    if override_color is None and convert_SHs_python:
        from gsplat_tpu.core import sh as sh_lib
        sh_deg = (pc.active_sh_degree if active_sh_degree is None
                  else active_sh_degree)
        override_color = sh_lib.sh_to_rgb(
            sh_deg,
            jnp.concatenate([pc.params.features_dc, pc.params.features_rest],
                            axis=1),
            pc.params.xyz, jnp.asarray(viewpoint_camera.camera_center))

    out = rasterize(
        cfg,
        pc.params.xyz,
        T.scaling_activation(pc.params.scaling),
        pc.params.rotation,
        opac,
        jnp.concatenate([pc.params.features_dc, pc.params.features_rest], axis=1),
        viewmatrix=jnp.asarray(viewpoint_camera.world_view_transform),
        projmatrix=jnp.asarray(viewpoint_camera.full_proj_transform),
        campos=jnp.asarray(viewpoint_camera.camera_center),
        tan_fovx=viewpoint_camera.tan_fovx,
        tan_fovy=viewpoint_camera.tan_fovy,
        bg=bg,
        segments=T.segment_activation(pc.params.segment),
        means2d_offset=means2d_offset,
        scale_modifier=scaling_modifier,
        colors_precomp=override_color,
        cov3d_precomp=cov3d_precomp,
    )
    image = out["render"]
    if rgb_factors is not None:
        image = image * rgb_factors.reshape(3, 1, 1)

    depth_raw = out["depth"]
    depth = depth_raw / (jnp.max(depth_raw) + 1e-5)  # reference :375

    return {
        "render": image,
        "viewspace_points": means2d_offset,
        "visibility_filter": out["visibility"],
        "radii": out["radii"],
        "depth": depth,
        "depth_raw": depth_raw,
        "alpha": out["alpha"],
        "segment": out.get("segment"),
        "overflow": out["overflow"],
        "num_rendered": out["num_rendered"],
    }
