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


def test_appearance_data_parallel_matches_mean_of_grads(rng):
    """VERDICT r3 item 7 + ADVICE r4: appearance embedding composed with
    --data_parallel.  Gaussian grads and the shared appearance MLP weights
    take the mean over the camera batch (pmean); the embedding-table rows
    are DISJOINT per camera, so they take their own full per-camera
    gradient (psum) — a mean would silently shrink the per-row appearance
    LR by 1/N_devices vs the reference's single-camera update."""
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.models import adam
    from gsplat_tpu.models.gaussians import GaussianModel, GaussianParams
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.parallel.data_parallel import (
        make_data_mesh, make_parallel_appearance_step, stack_camera_batches,
    )
    from gsplat_tpu.train.trainer import camera_batch, make_loss_fn
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_camera

    N_DEV = 4
    mesh = make_data_mesh(N_DEV)
    m = GaussianModel(3, num_class=2, capacity=256)
    m.create_from_pcd(rng.standard_normal((100, 3)).astype(np.float32),
                      rng.uniform(size=(100, 3)).astype(np.float32), 1.0)
    m.training_setup()
    app = app_lib.AppearanceOptimizer(N_DEV)
    cfg = RasterizeConfig(width=32, height=32, max_instances=1 << 12,
                          k_max=256, backend="jnp")
    opt = OptimizationParams()
    bg = jnp.zeros(3)
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    key = jax.random.PRNGKey(3)

    cams = []
    for i in range(N_DEV):
        c = make_camera(32, 32)
        c.uid = i
        c.image = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        cams.append(c)
    batches = [camera_batch(c) for c in cams]
    stacked = stack_camera_batches(batches)

    pstep = make_parallel_appearance_step(mesh, cfg, opt, 3, None, False, bg,
                                          app_lr=app.lr)
    p1, o1, a1, ap1, ao1, met = pstep(m.params, m.opt_state, m.aux,
                                      app.params, app.opt_state, stacked,
                                      lrs, key)
    assert np.isfinite(float(met["loss"]))
    # every embedding row that had a camera must have moved
    moved = np.abs(np.asarray(ap1.emb - app.params.emb)).max(axis=1)
    assert (moved[:N_DEV] > 0).all()

    # single-device reference: mean of per-camera grads (gaussian AND
    # appearance), then one replicated Adam update each
    loss_fn = make_loss_fn(cfg, opt, 3, None, False, bg, use_appearance=True)
    gsum, asum = None, None
    for i, b in enumerate(batches):
        k = jax.random.fold_in(key, i)
        g, ga = jax.grad(
            lambda p, a: loss_fn(p, jnp.zeros((m.capacity, 2)), b, k, a)[0],
            argnums=(0, 1))(m.params, app.params)
        gsum = g if gsum is None else jax.tree_util.tree_map(jnp.add, gsum, g)
        asum = ga if asum is None else jax.tree_util.tree_map(
            jnp.add, asum, ga)
    gmean = jax.tree_util.tree_map(lambda x: x / N_DEV, gsum)
    # emb rows: SUM of per-camera grads (each row touched by exactly one
    # camera -> its own full gradient); MLP weights: mean
    amean = jax.tree_util.tree_map(
        lambda x: x / N_DEV, asum)._replace(emb=asum.emb)
    lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
    pref, _ = adam.update(gmean, adam.init(m.params), m.params, lrs_tree)
    app_lrs = jax.tree_util.tree_map(lambda _: app.lr, app.params)
    apref, _ = adam.update(amean, adam.init(app.params), app.params, app_lrs)

    for k2 in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p1, k2)), np.asarray(getattr(pref, k2)),
            atol=2e-5, err_msg=f"gaussian param {k2}")
    for k2 in ap1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ap1, k2)), np.asarray(getattr(apref, k2)),
            atol=2e-5, err_msg=f"appearance param {k2}")


def test_trainer_accepts_appearance_with_data_parallel(tmp_path):
    """The r3 hard-raise is gone: Trainer(use_appearance, data_parallel)
    builds the composed step and trains a few iterations."""
    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from argparse import Namespace
    from make_synthetic_scene import make_scene
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    scene_dir = make_scene(str(tmp_path / "scene"), n_gauss=100, n_cams=4,
                           width=32, height=32, num_class=2,
                           with_depth=False)
    m = GaussianModel(3, num_class=2, capacity=512)
    args = Namespace(source_path=scene_dir, model_path=str(tmp_path / "m"),
                     images="images", resolution=-1, white_background=False,
                     eval=False, sh_degree=3, num_class=2,
                     data_device="cpu", using_depth=False, using_seg=False,
                     able_appearance_embedding=True)
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    tr = Trainer(m, scene, OptimizationParams(), backend="jnp",
                 max_instances=1 << 12, model_path=str(tmp_path / "m"),
                 use_appearance=True, data_parallel=4)
    losses = []
    tr.train(iterations=6, log_every=2,
             callback=lambda it, met, t: losses.append(float(met["loss"])))
    assert losses and np.isfinite(losses[-1])
    assert float(jnp.abs(tr.appearance.params.emb).max()) > 0
