"""Quaternion / covariance / activation math for gaussians.

Behavioral spec: reference forward.cu:118-152 (computeCov3D),
utils/general_utils.py:72-118 (build_rotation / build_scaling_rotation /
strip_symmetric) and scene/gaussian_model.py:27-43 (activations).
All functions are pure jnp, batched over the leading axis, fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x):
    """Logit. Reference: utils/general_utils.py:18."""
    return jnp.log(x / (1.0 - x))


def normalize(v, axis=-1, eps=1e-12):
    """L2-normalize along axis (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(q):
    """Unit quaternion (wxyz) -> rotation matrix, batched [..., 4] -> [..., 3, 3].

    Matches utils/general_utils.py:86-103 (build_rotation) including the
    normalization step.
    """
    q = normalize(q, axis=-1)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s, q):
    """L = R @ diag(s) batched. Reference: utils/general_utils.py:105-118."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # R @ diag(s)


def covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """World-space 3D covariance, packed as the 6 upper-triangular entries
    [xx, xy, xz, yy, yz, zz].

    Sigma = R S S^T R^T with R from the (normalized) quaternion — identical to
    both the CUDA path (forward.cu:118-152; note the glm transposes cancel to
    this form) and the python oracle (scene/gaussian_model.py:28-33).

    Written component-wise on [P] vectors: a batched [P,3,3] einsum would hit
    the MXU at 3/128 utilization; this form is pure full-width VPU work.
    """
    q = normalize(rotation, axis=-1)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ]
    s2 = [(scaling[..., j] * scaling_modifier) ** 2 for j in range(3)]

    def sigma(a, b):
        return (R[a][0] * R[b][0] * s2[0] + R[a][1] * R[b][1] * s2[1]
                + R[a][2] * R[b][2] * s2[2])

    return jnp.stack(
        [sigma(0, 0), sigma(0, 1), sigma(0, 2),
         sigma(1, 1), sigma(1, 2), sigma(2, 2)], axis=-1)


def strip_symmetric(S):
    """[..., 3, 3] symmetric -> packed [..., 6] (xx, xy, xz, yy, yz, zz).

    Reference: utils/general_utils.py:72-84.
    """
    return jnp.stack(
        [S[..., 0, 0], S[..., 0, 1], S[..., 0, 2],
         S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]],
        axis=-1,
    )


def unpack_symmetric(c6):
    """Packed [..., 6] -> full [..., 3, 3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# --- parameter activations (scene/gaussian_model.py:27-43) -------------------
scaling_activation = jnp.exp
scaling_inverse_activation = jnp.log
opacity_activation = jax.nn.sigmoid
segment_activation = jax.nn.sigmoid
inverse_opacity_activation = inverse_sigmoid
rotation_activation = normalize
