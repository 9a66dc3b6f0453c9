"""Appearance embedding + camera pose optimizer tests
(reference gaussian_renderer/__init__.py:34-199 parity)."""
import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.models import appearance as app_lib
from gsplat_tpu.models import pose as pose_lib


def test_appearance_forward_shape_and_range(rng):
    p = app_lib.init_params(5)
    vm = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    f = app_lib.apply(p, 2, vm)
    assert f.shape == (3,)
    assert np.all((np.asarray(f) > 0) & (np.asarray(f) < 1))  # sigmoid


def test_appearance_optimizer_learns(rng):
    opt = app_lib.AppearanceOptimizer(3)
    vm = jnp.asarray(np.eye(4, dtype=np.float32))
    target = jnp.array([0.9, 0.1, 0.5])

    def loss(params):
        return jnp.sum((app_lib.apply(params, 1, vm) - target) ** 2)

    l0 = float(loss(opt.params))
    for _ in range(200):
        g = jax.grad(loss)(opt.params)
        opt.update(g)
    l1 = float(loss(opt.params))
    assert l1 < l0 * 0.1


def test_appearance_save_load(tmp_path):
    opt = app_lib.AppearanceOptimizer(4)
    path = str(tmp_path / "app.npz")
    opt.save(path)
    opt2 = app_lib.AppearanceOptimizer(4)
    assert opt2.load(path)
    np.testing.assert_allclose(np.asarray(opt2.params.w0),
                               np.asarray(opt.params.w0))
    assert not opt2.load(str(tmp_path / "missing.npz"))


def test_appearance_train_step(rng):
    """Joint gaussian+appearance step (make_appearance_step)."""
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.train.trainer import camera_batch, make_appearance_step
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_camera

    m = GaussianModel(3, num_class=2, capacity=128)
    m.create_from_pcd(rng.standard_normal((60, 3)).astype(np.float32),
                      rng.uniform(size=(60, 3)).astype(np.float32), 1.0)
    m.training_setup()
    app = app_lib.AppearanceOptimizer(2)
    cam = make_camera(32, 32)
    cam.image = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    cfg = RasterizeConfig(width=32, height=32, max_instances=1 << 12,
                          k_max=128, backend="jnp")
    step = make_appearance_step(cfg, OptimizationParams(), 3, None, False,
                                jnp.zeros(3))
    lrs = {k: jnp.float32(1e-3) for k in
           ["xyz", "features_dc", "features_rest", "scaling", "rotation",
            "opacity", "segment"]}
    p, o, a, ap, ao, met = step(m.params, m.opt_state, m.aux, app.params,
                                app.opt_state, camera_batch(cam), lrs,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(met["loss"]))
    # appearance embedding received gradient
    assert float(jnp.abs(ap.emb - app.params.emb).max()) > 0


def test_so3_exp_identity_and_rotation():
    R0 = pose_lib.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R0), np.eye(3), atol=1e-7)
    # 90 deg about z
    R = pose_lib.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)


def test_pose_delta_application(rng):
    opt = pose_lib.CameraOptimizer(2)
    M = jnp.asarray(np.eye(4, dtype=np.float32))
    out = pose_lib.apply_pose_delta(opt.params, 0, M)
    np.testing.assert_allclose(np.asarray(out), np.eye(4), atol=1e-6)
    # a translation delta moves the translation row
    params = pose_lib.PoseParams(
        deltas=jnp.zeros((2, 6)).at[0, 3:].set(jnp.array([1.0, 2.0, 3.0])))
    out = pose_lib.apply_pose_delta(params, 0, M)
    np.testing.assert_allclose(np.asarray(out)[3, :3], [1, 2, 3], atol=1e-6)
