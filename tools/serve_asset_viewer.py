#!/usr/bin/env python
"""Serve the HTTP viewer (server-side renders + /viewer WebGL page) on a
bare PLY/NPZ asset — no model directory needed.  Handy for inspecting the
committed bench assets:

    python tools/serve_asset_viewer.py assets/trained_scene.ply --port 5005
"""
from __future__ import annotations

import argparse
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("asset")
    ap.add_argument("--port", type=int, default=5005)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    args = ap.parse_args()

    import numpy as np

    from gsplat_tpu.core.cameras import Camera
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.viz.render_app import RenderServer

    m = GaussianModel(3, num_class=2, capacity=1)
    if args.asset.endswith(".npz"):
        # compressed bench-asset format (tools/run_r5_big30k.py): raw
        # param fields, geometry f32, SH bands fp16
        import jax.numpy as jnp

        z = np.load(args.asset)
        n = int(z["xyz"].shape[0])
        cap = 1 << max(1, (n - 1).bit_length())
        m = GaussianModel(3, num_class=2, capacity=cap)
        p = m.params
        idx = np.arange(n)
        m.params = p._replace(
            xyz=p.xyz.at[idx].set(z["xyz"].astype(np.float32)),
            scaling=p.scaling.at[idx].set(z["scaling"].astype(np.float32)),
            rotation=p.rotation.at[idx].set(
                z["rotation"].astype(np.float32)),
            opacity=p.opacity.at[idx].set(z["opacity"].astype(np.float32)),
            features_dc=p.features_dc.at[idx].set(
                z["features_dc"].astype(np.float32)),
            features_rest=p.features_rest.at[idx].set(
                z["features_rest"].astype(np.float32)))
        m.aux = m.aux._replace(alive=m.aux.alive.at[idx].set(True))
    else:
        m.load_ply(args.asset)

    alive = np.asarray(m.aux.alive)
    pts = np.asarray(m.get_xyz)[alive]
    center = pts.mean(axis=0)
    extent = float(np.percentile(np.linalg.norm(pts - center, axis=1), 95))
    fovx = math.radians(60.0)
    fovy = 2 * math.atan(math.tan(fovx / 2) * args.height / args.width)
    cam = Camera(colmap_id=0, R=np.eye(3), T=center + [0, 0, 2.2 * extent],
                 FoVx=fovx, FoVy=fovy,
                 image=np.zeros((3, args.height, args.width), np.float32),
                 image_name="viewer", uid=0)
    RenderServer(m, cam, backend=args.backend).serve(port=args.port)


if __name__ == "__main__":
    main()
