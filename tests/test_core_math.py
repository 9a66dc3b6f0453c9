"""Unit tests of core math vs closed forms (SURVEY.md §4 test pyramid tier 1)."""
import numpy as np
import jax.numpy as jnp

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core import transforms as T
from gsplat_tpu.core.cameras import (
    Camera, fov2focal, focal2fov, get_projection_matrix, get_world2view2,
)


def test_quat_identity():
    q = jnp.array([[1.0, 0, 0, 0]])
    R = T.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)


def test_quat_90deg_z(rng):
    # 90° about z: w = cos(45°), z = sin(45°)
    s = np.sqrt(0.5)
    q = jnp.array([[s, 0, 0, s]])
    R = np.asarray(T.quat_to_rotmat(q))[0]
    expected = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_normalization_invariance(rng):
    q = rng.standard_normal((10, 4)).astype(np.float32)
    R1 = T.quat_to_rotmat(jnp.asarray(q))
    R2 = T.quat_to_rotmat(jnp.asarray(q * 3.7))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    # orthonormality
    RtR = np.einsum("pij,pik->pjk", np.asarray(R1), np.asarray(R1))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_covariance_psd_and_eigvals(rng):
    scales = np.exp(rng.standard_normal((20, 3)).astype(np.float32) * 0.3)
    quats = rng.standard_normal((20, 4)).astype(np.float32)
    cov6 = T.covariance_from_scaling_rotation(jnp.asarray(scales), 1.0, jnp.asarray(quats))
    full = np.asarray(T.unpack_symmetric(cov6))
    # Sigma = R diag(s^2) R^T -> eigenvalues are s^2.
    for i in range(20):
        ev = np.sort(np.linalg.eigvalsh(full[i]))
        np.testing.assert_allclose(ev, np.sort(scales[i] ** 2), rtol=1e-4, atol=1e-5)


def test_strip_unpack_roundtrip(rng):
    A = rng.standard_normal((5, 3, 3)).astype(np.float32)
    S = A @ A.transpose(0, 2, 1)
    packed = T.strip_symmetric(jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(T.unpack_symmetric(packed)), S, rtol=1e-5)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(T.opacity_activation(T.inverse_sigmoid(x))), np.asarray(x), atol=1e-6
    )


def test_sh_degree0_constant(rng):
    shc = rng.standard_normal((4, 16, 3)).astype(np.float32)
    dirs = rng.standard_normal((4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh_lib.eval_sh(0, jnp.asarray(shc), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out), sh_lib.C0 * shc[:, 0], rtol=1e-5)


def test_sh_parseval_degree1(rng):
    # degree-1 SH of direction d must be linear in d.
    shc = np.zeros((1, 16, 1), np.float32)
    shc[0, 1, 0] = 1.0
    d = np.array([[0.0, 1.0, 0.0]], np.float32)
    out = sh_lib.eval_sh(1, jnp.asarray(shc), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out)[0, 0], -sh_lib.C1, rtol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(7, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sh_lib.sh_to_rgb_dc(sh_lib.rgb_to_sh(jnp.asarray(rgb)))), rgb, rtol=1e-5
    )


def test_projection_matrix_corners():
    znear, zfar = 0.01, 100.0
    fovx = fovy = np.deg2rad(60.0)
    P = get_projection_matrix(znear, zfar, fovx, fovy)
    # A point on the near plane right edge maps to x_ndc = 1.
    x_edge = np.tan(fovx / 2) * znear
    p = np.array([x_edge, 0, znear, 1.0])
    clip = P @ p
    np.testing.assert_allclose(clip[0] / clip[3], 1.0, atol=1e-5)
    # Depth mapping: z_view -> z*zfar/(zfar-znear) - zfar*znear/(zfar-znear); /w
    p2 = np.array([0, 0, zfar, 1.0])
    clip2 = P @ p2
    np.testing.assert_allclose(clip2[2] / clip2[3], 1.0, atol=1e-4)


def test_world2view_roundtrip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    R = np.asarray(T.quat_to_rotmat(jnp.asarray(q[None]))[0])
    t = rng.standard_normal(3)
    M = get_world2view2(R, t)
    # camera center must map to origin
    C2W = np.linalg.inv(M)
    center = C2W[:3, 3]
    mapped = M[:3, :3] @ center + M[:3, 3]
    np.testing.assert_allclose(mapped, 0.0, atol=1e-5)


def test_camera_matrices_consistency(rng):
    R = np.eye(3)
    t = np.array([0.0, 0.0, 2.0])
    img = np.zeros((3, 32, 48), np.float32)
    cam = Camera(colmap_id=0, R=R, T=t, FoVx=np.deg2rad(60), FoVy=np.deg2rad(45),
                 image=img, image_name="x", uid=0)
    assert cam.image_width == 48 and cam.image_height == 32
    fp = cam.world_view_transform @ cam.projection_matrix
    np.testing.assert_allclose(cam.full_proj_transform, fp, atol=1e-6)
    # row-vector convention: origin @ M = translation row
    origin = np.array([0.0, 0, 0, 1])
    view = origin @ cam.world_view_transform
    np.testing.assert_allclose(view[:3], t, atol=1e-5)
    np.testing.assert_allclose(focal2fov(fov2focal(1.0, 100), 100), 1.0)
