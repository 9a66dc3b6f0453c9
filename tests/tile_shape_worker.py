"""Subprocess worker for the tile-shape invariance test: renders the
deterministic test scene with whatever GSPLAT_TILE_X/Y the environment
says (the constants are snapshotted at import) and writes the outputs.

Usage: python tile_shape_worker.py <out.npz> [cull]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize  # noqa: E402

from helpers import cam_args, make_camera, make_gaussians  # noqa: E402


def main():
    out_path = sys.argv[1]
    cull = sys.argv[2] if len(sys.argv) > 2 else "none"
    backend = sys.argv[3] if len(sys.argv) > 3 else "jnp"
    rng = np.random.default_rng(77)
    W, H = 64, 64
    cam = make_camera(W, H)
    g = make_gaussians(rng, n=300)
    cfg = RasterizeConfig(width=W, height=H, max_instances=1 << 14,
                          k_max=512, backend=backend, cull=cull,
                          grad_precision="f32", feat_precision="f32")
    out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                    g["opacities"], g["shs"], **cam_args(cam),
                    bg=jnp.array([0.1, 0.2, 0.3]))
    np.savez(out_path,
             render=np.asarray(out["render"]),
             depth=np.asarray(out["depth"]),
             alpha=np.asarray(out["alpha"]),
             radii=np.asarray(out["radii"]),
             tile_x=int(os.environ.get("GSPLAT_TILE_X", "16")),
             tile_y=int(os.environ.get("GSPLAT_TILE_Y", "16")))


if __name__ == "__main__":
    main()
