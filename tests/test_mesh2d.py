"""Composed (data x tile) 2D mesh training (VERDICT r2 item 4): camera
batch over 'data', bit-exact tile-row slices over 'tile', parameter grads
psum'd over BOTH axes — must match a single-device mean-over-cameras step."""
import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.config import OptimizationParams
from gsplat_tpu.models.gaussians import GaussianModel, GaussianParams
from gsplat_tpu.ops.rasterize import RasterizeConfig
from gsplat_tpu.parallel.data_parallel import stack_camera_batches
from gsplat_tpu.parallel.mesh2d import make_2d_mesh, make_2d_train_step
from gsplat_tpu.train.trainer import camera_batch, make_loss_fn

from helpers import make_camera


def _model(rng, n=150, capacity=256, num_class=2):
    m = GaussianModel(3, num_class=num_class, capacity=capacity)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    m.create_from_pcd(pts, cols, 1.0)
    m.training_setup()
    return m


def _single_device_reference(cfg, opt, bg, m, batches, lrs, key):
    """Mean-over-cameras step on one device with the data_parallel stats
    semantics (per-camera grad-norm sums, radii maxima), hand-rolled from
    make_loss_fn — the oracle for the 2D-mesh step."""
    from gsplat_tpu.models import adam
    from gsplat_tpu.models.densify import add_densification_stats

    loss_fn = make_loss_fn(cfg, opt, 3, None, True, bg)
    P = m.params.xyz.shape[0]
    m2d = jnp.zeros((P, 2), jnp.float32)
    gs, losses, aux = [], [], m.aux
    scale = jnp.array([0.5 * cfg.width, 0.5 * cfg.height])
    for b in batches:
        (l, auxout), (gp, gm) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(m.params, m2d, b, key)
        losses.append(l)
        gs.append(gp)
        aux = add_densification_stats(aux, gm * scale[None, :],
                                      auxout["radii"])
    gmean = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / len(xs), *gs)
    lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
    params, opt_state = adam.update(gmean, m.opt_state, m.params, lrs_tree)
    return params, opt_state, aux, jnp.mean(jnp.stack(losses))


def test_mesh2d_train_step_matches_single_device(rng):
    M, N = 2, 2
    H = W = 64
    cams = []
    for i in range(M):
        cam = make_camera(W, H, dist=3.5 + 0.6 * i)
        cam.image = rng.uniform(size=(3, H, W)).astype(np.float32)
        cam.segment = rng.integers(0, 2, (H, W)).astype(np.int32)
        cams.append(cam)
    m = _model(rng)
    opt = OptimizationParams()
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, num_class=2,
                          max_instances=1 << 14, k_max=512, backend="jnp")
    batches = [camera_batch(c) for c in cams]
    stacked = stack_camera_batches(batches)
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    key = jax.random.PRNGKey(0)

    p1, o1, a1, loss1 = _single_device_reference(
        cfg, opt, bg, m, batches, lrs, key)

    mesh = make_2d_mesh(M, N)
    step = make_2d_train_step(mesh, cfg, opt, 3, None, True, bg)
    p2, o2, a2, met2 = step(m.params, m.opt_state, m.aux, stacked, lrs, key)

    assert np.isfinite(float(met2["loss"]))
    np.testing.assert_allclose(float(met2["loss"]), float(loss1), rtol=1e-6)
    for k in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p2, k)), np.asarray(getattr(p1, k)),
            atol=1e-5, err_msg=f"param {k} diverges from single-device step")
    np.testing.assert_allclose(np.asarray(a2.xyz_gradient_accum),
                               np.asarray(a1.xyz_gradient_accum),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(a2.denom), np.asarray(a1.denom))
    np.testing.assert_array_equal(np.asarray(a2.max_radii2d),
                                  np.asarray(a1.max_radii2d))


def test_mesh2d_appearance_matches_single_device(rng):
    """VERDICT r4 item 6: appearance composed over the (data x tile) mesh.
    Single-device oracle: per-camera grads from make_loss_fn(use_appearance)
    — gaussians and the shared appearance MLP take the camera mean,
    disjoint embedding rows take their own full per-camera gradient
    (data_parallel's psum/pmean split)."""
    from gsplat_tpu.models import adam
    from gsplat_tpu.models import appearance as app_lib

    M, N = 2, 2
    H = W = 64
    cams = []
    for i in range(M):
        cam = make_camera(W, H, dist=3.5 + 0.6 * i)
        cam.uid = i
        cam.image = rng.uniform(size=(3, H, W)).astype(np.float32)
        cams.append(cam)
    m = _model(rng, num_class=0)
    app = app_lib.AppearanceOptimizer(M)
    app.params = app.params._replace(
        emb=jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32)))
    opt = OptimizationParams()
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_instances=1 << 14,
                          k_max=512, backend="jnp")
    batches = [camera_batch(c) for c in cams]
    stacked = stack_camera_batches(batches)
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    key = jax.random.PRNGKey(0)

    # single-device oracle
    loss_fn = make_loss_fn(cfg, opt, 3, None, False, bg,
                           use_appearance=True)
    P = m.params.xyz.shape[0]
    m2d = jnp.zeros((P, 2), jnp.float32)
    gsum, asum = None, None
    for b in batches:
        g, ga = jax.grad(
            lambda p, a: loss_fn(p, m2d, b, key, a)[0],
            argnums=(0, 1))(m.params, app.params)
        gsum = (g if gsum is None
                else jax.tree_util.tree_map(jnp.add, gsum, g))
        asum = (ga if asum is None
                else jax.tree_util.tree_map(jnp.add, asum, ga))
    gmean = jax.tree_util.tree_map(lambda x: x / M, gsum)
    aref = jax.tree_util.tree_map(lambda x: x / M,
                                  asum)._replace(emb=asum.emb)
    lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
    p1, _ = adam.update(gmean, m.opt_state, m.params, lrs_tree)
    app_lrs = jax.tree_util.tree_map(lambda _: app.lr, app.params)
    ap1, _ = adam.update(aref, app.opt_state, app.params, app_lrs)

    mesh = make_2d_mesh(M, N)
    step = make_2d_train_step(mesh, cfg, opt, 3, None, False, bg,
                              use_appearance=True, app_lr=app.lr)
    p2, o2, a2, ap2, ao2, met2 = step(m.params, m.opt_state, m.aux,
                                      app.params, app.opt_state, stacked,
                                      lrs, key)

    assert np.isfinite(float(met2["loss"]))
    for k in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p2, k)), np.asarray(getattr(p1, k)),
            atol=1e-5, err_msg=f"param {k}")
    for k in ap2._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ap2, k)), np.asarray(getattr(ap1, k)),
            atol=1e-5, err_msg=f"appearance param {k}")


def test_mesh2d_cli_smoke(tmp_path):
    """--data_parallel 2 --tile_parallel 2 runs end-to-end on the 8-device
    CPU mesh through the training CLI (the product surface)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synthetic_scene import make_scene

    scene_dir = str(tmp_path / "scene")
    # height must split into whole tile rows per device: 64 = 2 x 2 tiles
    make_scene(scene_dir, n_gauss=120, n_cams=6, width=64, height=64,
               num_class=0, with_depth=False)
    from gsplat_tpu.scripts.train import main
    model_dir = str(tmp_path / "model")
    main(["-s", scene_dir, "-m", model_dir,
          "--iterations_override", "8",
          "--backend", "jnp", "--max_instances", str(1 << 13),
          "--capacity", "512",
          "--data_parallel", "2", "--tile_parallel", "2",
          "--test_iterations", "8", "--save_iterations", "8"])
    assert os.path.exists(os.path.join(model_dir, "point_cloud",
                                       "iteration_8", "point_cloud.ply"))
