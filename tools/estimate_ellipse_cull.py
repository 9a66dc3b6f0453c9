#!/usr/bin/env python
"""Estimate the instance reduction exact ellipse-vs-tile culling would give:
for every (gaussian, tile-of-rect) instance, compute the true minimum of the
quadratic form q(p) = 0.5 d^T conic d over the 16x16-pixel tile box (convex
QP: interior + 4 clamped-edge minima) and count instances where
min q > ln(255*opacity), i.e. alpha < 1/255 at EVERY pixel of the tile —
dropping them is bit-exact (the composite kernel would skip all of them)."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from bench import build_scene
    from gsplat_tpu.ops import preprocess as pre_lib

    W, H = 1920, 1080
    N = 500_000
    cam, g = build_scene(N, W, H)
    pre = pre_lib.preprocess(
        g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"],
        3, jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), jnp.asarray(cam.camera_center),
        jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy), W, H)

    vis = np.asarray(pre.visible)
    rmin = np.asarray(pre.rect_min)[vis]
    rmax = np.asarray(pre.rect_max)[vis]
    mean = np.asarray(pre.means2d)[vis]
    con = np.asarray(pre.conic)[vis]            # (a, b, c): q = .5(a dx^2 + c dy^2) + b dx dy
    op = np.asarray(pre.opacity)[vis]
    tau = np.log(np.maximum(255.0 * op, 1.0 + 1e-6))

    # expand instances (numpy, chunked over gaussians)
    total = 0
    prunable = 0
    B = 50_000
    for s in range(0, mean.shape[0], B):
        e = min(s + B, mean.shape[0])
        n = e - s
        w_t = rmax[s:e, 0] - rmin[s:e, 0]
        h_t = rmax[s:e, 1] - rmin[s:e, 1]
        maxw, maxh = int(w_t.max()), int(h_t.max())
        for ty in range(maxh):
            for tx in range(maxw):
                m = (tx < w_t) & (ty < h_t)
                if not m.any():
                    continue
                x0 = (rmin[s:e, 0][m] + tx) * 16.0
                y0 = (rmin[s:e, 1][m] + ty) * 16.0
                x1, y1 = x0 + 15.0, y0 + 15.0   # pixel centers span
                mx, my = mean[s:e, 0][m], mean[s:e, 1][m]
                a, b, c = con[s:e, 0][m], con[s:e, 1][m], con[s:e, 2][m]

                def q(dx, dy):
                    return 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy

                inside = ((mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1))
                # edge minima: fix x at x0/x1, minimize over y in [y0,y1]:
                # dq/dy = c*dy + b*dx = 0 -> dy = -b*dx/c
                best = np.where(inside, 0.0, np.inf)
                for fx in (x0, x1):
                    dx = fx - mx
                    dy = np.clip(-b * dx / np.maximum(c, 1e-12),
                                 y0 - my, y1 - my)
                    best = np.minimum(best, q(dx, dy))
                for fy in (y0, y1):
                    dy = fy - my
                    dx = np.clip(-b * dy / np.maximum(a, 1e-12),
                                 x0 - mx, x1 - mx)
                    best = np.minimum(best, q(dx, dy))
                total += int(m.sum())
                prunable += int((best > tau[s:e][m]).sum())
        print(f"  {e}/{mean.shape[0]} gaussians: prunable "
              f"{prunable}/{total} = {prunable/max(total,1):.1%}", flush=True)

    print(f"FINAL: {prunable}/{total} instances exactly prunable "
          f"({prunable/max(total,1):.1%})")


if __name__ == "__main__":
    main()
