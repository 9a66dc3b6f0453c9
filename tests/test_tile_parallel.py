"""Tile-sharded rendering: slice-per-device == single-device full render."""
import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import Mesh

from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
from gsplat_tpu.parallel.tile_parallel import (
    crop_projection, make_tile_sharded_render, slice_camera,
)

from helpers import cam_args, make_camera, make_gaussians


def test_crop_projection_identity():
    cam = make_camera(64, 64)
    M = crop_projection(cam.full_proj_transform, 64, 0, 64)
    np.testing.assert_allclose(M, cam.full_proj_transform, atol=1e-6)


def test_tile_sharded_matches_full(rng):
    D = 4
    cam = make_camera(64, 64)
    g = make_gaussians(rng, n=200)
    bg = jnp.array([0.1, 0.2, 0.3])

    cfg = RasterizeConfig(width=64, height=64, max_instances=1 << 14,
                          k_max=512, backend="jnp")
    full = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                     g["opacities"], g["shs"], **cam_args(cam), bg=bg)

    mesh = Mesh(np.array(jax.devices()[:D]), ("tile",))
    render = make_tile_sharded_render(mesh, cfg)
    camera = slice_camera(cam, D)
    out = render(g["means3d"], g["scales"], g["rotations"], g["opacities"],
                 g["shs"], camera, bg)

    # interiors must match; the EWA fov-clamp (1.3*tanfov, forward.cu:86-88)
    # is evaluated per-slice so extreme out-of-slice gaussians can differ at
    # slice boundaries — compare with a small tolerance and check the bulk
    # matches tightly.
    a = np.asarray(out["render"])
    b = np.asarray(full["render"])
    diff = np.abs(a - b)
    assert np.median(diff) < 1e-6
    assert (diff < 1e-4).mean() > 0.99, f"mismatch beyond boundary effects: {diff.max()}"
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(full["alpha"]), atol=1e-3)
