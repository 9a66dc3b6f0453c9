"""Tile-sharded (spatial-parallel) rendering: one large image split across
chips by tile ROWS.

SURVEY.md §2.3: "shard the 16x16 tile grid of one large image across chips;
per-tile composite is embarrassingly parallel after binning".  TPU-native
realization WITHOUT touching the kernels: each device renders a horizontal
slice of the image through an OFF-CENTER (principal-point-shifted) projection
matrix — the slice is just a crop of the full camera frustum, so every device
runs the identical static-shape rasterize() program and only the (traced)
projection matrix / tan_fovy differ.  Binning runs per-device on its slice
(gaussians outside the slice are frustum/rect-culled), compositing matches
the full render exactly, and per-gaussian gradients all-reduce with psum
over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.parallel.data_parallel import shard_map
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize


def crop_projection(projection_matrix: np.ndarray, height: int, y0: int,
                    hs: int) -> np.ndarray:
    """Off-center projection for image rows [y0, y0+hs) of a full-height
    ``height`` camera (transposed/row-vector convention).

    Full-image NDC y maps pixels via px_y = ((y_ndc+1)*H - 1)/2
    (auxiliary.h:40-43); the slice needs y'_ndc with
    px'_y = px_y - y0 over height hs, i.e. y' = a*y + b with
    a = H/hs, b = (H - 2*y0)/hs - 1.
    """
    a = height / hs
    b = (height - 2.0 * y0) / hs - 1.0
    M = np.array(projection_matrix, np.float32).copy()
    # row-vector convention: clip = p @ M; y_clip is column 1; w is column 3.
    # y'_clip = a*y_clip + b*w_clip
    M[:, 1] = a * M[:, 1] + b * M[:, 3]
    return M


def make_tile_sharded_render(mesh: Mesh, cfg_full: RasterizeConfig):
    """Returns render(means3d, scales, rotations, opacities, shs, camera
    dict, bg) -> full [3, H, W] image, computed slice-per-device.

    ``camera`` needs viewmatrix [4,4], projmatrix_slices [D,4,4] (from
    :func:`crop_projection` per device), campos, tan_fovx, tan_fovy_slice
    (scalar: hs/(2*focal_y)); D = mesh size.
    """
    D = mesh.shape["tile"]
    H, W = cfg_full.height, cfg_full.width
    assert H % (16 * D) == 0, "height must split into whole tile rows per device"
    hs = H // D
    cfg = RasterizeConfig(
        width=W, height=hs, sh_degree=cfg_full.sh_degree,
        num_class=cfg_full.num_class,
        max_instances=cfg_full.max_instances, k_max=cfg_full.k_max,
        tile_batch=cfg_full.tile_batch, backend=cfg_full.backend)

    def device_render(means3d, scales, rotations, opacities, shs,
                      viewmatrix, proj_slices, campos, tan_fovx,
                      tan_fovy_slice, tan_fovy_full, bg):
        proj = proj_slices[0]   # local shard [1,4,4]
        out = rasterize(cfg, means3d, scales, rotations, opacities, shs,
                        viewmatrix=viewmatrix, projmatrix=proj,
                        campos=campos, tan_fovx=tan_fovx,
                        tan_fovy=tan_fovy_slice, bg=bg,
                        clamp_tan_fovy=tan_fovy_full)
        return out["render"][None], out["depth"][None], out["alpha"][None]

    rep = P()
    fn = shard_map(
        device_render, mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, P("tile"), rep, rep, rep,
                  rep, rep),
        out_specs=(P(None, None, "tile", None), P(None, "tile", None),
                   P(None, "tile", None)),
    )

    @jax.jit
    def render_full(means3d, scales, rotations, opacities, shs, camera, bg):
        img, depth, alpha = fn(
            means3d, scales, rotations, opacities, shs,
            camera["viewmatrix"], camera["projmatrix_slices"],
            camera["campos"], camera["tan_fovx"], camera["tan_fovy_slice"],
            camera["tan_fovy_full"], bg)
        # slices concatenate along the sharded row axis
        return {
            "render": img.reshape(3, H, W) if img.ndim == 4 else img,
            "depth": depth.reshape(H, W),
            "alpha": alpha.reshape(H, W),
        }

    return render_full


def slice_camera(cam, n_devices: int) -> dict:
    """Host helper: per-device off-center projections for a Camera."""
    H = cam.image_height
    hs = H // n_devices
    from gsplat_tpu.core.cameras import fov2focal
    focal_y = fov2focal(cam.FoVy, H)
    projs = np.stack([
        crop_projection(cam.full_proj_transform, H, d * hs, hs)
        for d in range(n_devices)])
    return {
        "viewmatrix": jnp.asarray(cam.world_view_transform),
        "projmatrix_slices": jnp.asarray(projs),
        "campos": jnp.asarray(cam.camera_center),
        "tan_fovx": jnp.float32(cam.tan_fovx),
        "tan_fovy_slice": jnp.float32(hs / (2.0 * focal_y)),
        "tan_fovy_full": jnp.float32(cam.tan_fovy),
    }
