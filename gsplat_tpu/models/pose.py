"""Camera pose optimizer — per-camera 6-DoF SO(3)xR^3 exp-map deltas.

Behavioral spec: reference gaussian_renderer/__init__.py:34-110
(CameraOptimizer; present but commented out of the reference train loop,
train.py:38-39,186-187 — provided here as a first-class differentiable
component).  A learned tangent vector [omega | t] per camera perturbs the
world-view transform: W2C' = exp([omega]_x) W2C + t.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.models import adam


class PoseParams(NamedTuple):
    deltas: jnp.ndarray  # [num_cameras, 6] (so3 omega, translation)


def so3_exp(omega):
    """Rodrigues exp map, batched-safe near zero."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = omega / theta
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    th = theta[0]
    R = (jnp.eye(3) + jnp.sin(th) * K
         + (1.0 - jnp.cos(th)) * (K @ K))
    # exact identity at zero rotation
    return jnp.where(th < 1e-9, jnp.eye(3), R)


def apply_pose_delta(params: PoseParams, cam_uid, world_view_transform):
    """Perturb a (transposed, row-vector convention) world-view matrix."""
    d = params.deltas[cam_uid]
    R_delta = so3_exp(d[:3])
    M = world_view_transform  # [4,4] transposed W2C
    # un-transpose, perturb, re-transpose
    W2C = M.T
    R = R_delta @ W2C[:3, :3]
    t = W2C[:3, 3] + d[3:]
    out = jnp.eye(4)
    out = out.at[:3, :3].set(R)
    out = out.at[:3, 3].set(t)
    return out.T


class CameraOptimizer:
    """Host container mirroring the reference's CameraOptimizer."""

    def __init__(self, num_cameras: int, lr: float = 1e-4):
        self.num_cameras = num_cameras
        self.lr = lr
        self.params = PoseParams(deltas=jnp.zeros((num_cameras, 6)))
        self.opt_state = adam.init(self.params)

    def __call__(self, viewpoint_cam):
        return apply_pose_delta(
            self.params, viewpoint_cam.uid,
            jnp.asarray(viewpoint_cam.world_view_transform))

    def update(self, grads):
        lrs = jax.tree_util.tree_map(lambda _: self.lr, self.params)
        self.params, self.opt_state = adam.update(
            grads, self.opt_state, self.params, lrs)
