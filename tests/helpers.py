"""Shared test scene builders."""
import numpy as np
import jax.numpy as jnp

from gsplat_tpu.core.cameras import Camera


def make_camera(width=64, height=48, fov_deg=60.0, dist=4.0):
    R = np.eye(3)
    t = np.array([0.0, 0.0, dist])
    img = np.zeros((3, height, width), np.float32)
    import math
    fovx = math.radians(fov_deg)
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    return Camera(colmap_id=0, R=R, T=t, FoVx=fovx, FoVy=fovy,
                  image=img, image_name="test", uid=0)


def make_gaussians(rng, n=200, num_class=0, spread=1.2, sh_degree=3):
    """Random gaussian cloud near the origin, looking down +z from dist."""
    K = (sh_degree + 1) ** 2
    g = dict(
        means3d=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * spread),
        scales=jnp.asarray(np.exp(rng.standard_normal((n, 3)).astype(np.float32) * 0.5 - 2.5)),
        rotations=jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32)),
        shs=jnp.asarray(rng.standard_normal((n, K, 3)).astype(np.float32) * 0.3),
    )
    if num_class:
        g["segments"] = jnp.asarray(
            rng.uniform(0.05, 0.95, (n, num_class)).astype(np.float32))
    return g


def cam_args(cam):
    return dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy,
    )
