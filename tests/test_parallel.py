"""Multi-device data-parallel training step on the 8-device virtual CPU mesh
(SURVEY.md §4 tier 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsplat_tpu.config import OptimizationParams
from gsplat_tpu.models import adam
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.rasterize import RasterizeConfig
from gsplat_tpu.parallel.data_parallel import (
    make_data_mesh, make_parallel_train_step, stack_camera_batches,
)
from gsplat_tpu.train.trainer import camera_batch, make_train_step

from helpers import make_camera, make_gaussians


def _model_from(rng, n=120, capacity=256):
    m = GaussianModel(3, num_class=2, capacity=capacity)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    m.create_from_pcd(pts, cols, 1.0)
    m.training_setup()
    return m


def _cam_with_gt(rng, angle_deg):
    import math
    cam = make_camera(32, 32)
    cam.image = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    return cam


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_data_mesh()
    assert mesh.shape["data"] == 8


def test_parallel_step_runs_and_matches_mean_of_grads(rng):
    mesh = make_data_mesh(4)
    m = _model_from(rng)
    opt = OptimizationParams()
    cfg = RasterizeConfig(width=32, height=32, num_class=0,
                          max_instances=1 << 12, k_max=256, backend="jnp")
    bg = jnp.zeros(3)
    pstep = make_parallel_train_step(mesh, cfg, opt, 3, None, False, bg)

    cams = [_cam_with_gt(rng, a) for a in range(4)]
    batches = [camera_batch(c) for c in cams]
    stacked = stack_camera_batches(batches)
    lrs = {k: jnp.float32(1e-3) for k in
           ["xyz", "features_dc", "features_rest", "scaling", "rotation",
            "opacity", "segment"]}
    key = jax.random.PRNGKey(0)

    p1, o1, a1, met = pstep(m.params, m.opt_state, m.aux, stacked, lrs, key)
    assert np.isfinite(float(met["loss"]))

    # single-device sequential average-gradient equivalence:
    # run the per-camera loss grads manually and average
    from gsplat_tpu.train.trainer import make_loss_fn
    loss_fn = make_loss_fn(cfg, opt, 3, None, False, bg)
    gsum = None
    for i, b in enumerate(batches):
        k = jax.random.fold_in(key, i)
        g = jax.grad(lambda p: loss_fn(
            p, jnp.zeros((m.capacity, 2)), b, k)[0])(m.params)
        gsum = g if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, g)
    gmean = jax.tree_util.tree_map(lambda x: x / 4, gsum)
    st = adam.init(m.params)
    from gsplat_tpu.models.gaussians import GaussianParams
    lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
    pref, _ = adam.update(gmean, st, m.params, lrs_tree)

    for k2 in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p1, k2)), np.asarray(getattr(pref, k2)),
            atol=2e-5, err_msg=f"param {k2} diverges from mean-grad update")


def test_trainer_data_parallel_converges_like_single(tmp_path):
    """VERDICT r1 item 1: the Trainer's mesh mode (--data_parallel) must
    train the synthetic scene through densify + opacity-reset boundaries to
    the same PSNR ballpark as the single-device loop."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synthetic_scene import make_scene
    from argparse import Namespace
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.train.trainer import Trainer
    from gsplat_tpu.train import losses as L
    from gsplat_tpu.renderer import render

    scene_dir = make_scene(str(tmp_path / "scene"), n_gauss=150, n_cams=8,
                           width=48, height=48, num_class=0)

    def run(dp, outdir):
        m = GaussianModel(3, num_class=0, capacity=1024)
        args = Namespace(source_path=scene_dir, model_path=outdir,
                         images="images", resolution=-1,
                         white_background=False, eval=False, sh_degree=3,
                         num_class=0, data_device="cpu", using_depth=False,
                         using_seg=False, able_appearance_embedding=False)
        scene = Scene(args, m, shuffle=False)
        m.training_setup()
        opt = OptimizationParams()
        opt.densify_from_iter = 30
        opt.densification_interval = 40
        opt.opacity_reset_interval = 120
        opt.densify_until_iter = 150
        tr = Trainer(m, scene, opt, backend="jnp", max_instances=1 << 14,
                     model_path=outdir, data_parallel=dp)
        assert tr.data_parallel == (dp if dp > 1 else 0)
        tr.train(iterations=160, log_every=20)
        cam = scene.getTrainCameras()[0]
        out = render(cam, m, backend="jnp", max_instances=1 << 14)
        img = jnp.clip(out["render"], 0, 1)
        return float(L.psnr(img, jnp.asarray(cam.image))), m.num_alive

    psnr_dp, alive_dp = run(4, str(tmp_path / "dp"))
    psnr_1, alive_1 = run(1, str(tmp_path / "single"))
    assert psnr_dp > 15.0, f"data-parallel PSNR too low: {psnr_dp}"
    # 4x cameras/step sees 4x data in the same iteration budget; it must be
    # at least as good as single-device minus noise
    assert psnr_dp > psnr_1 - 1.5, (psnr_dp, psnr_1)
    assert alive_dp > 0 and alive_1 > 0


def test_parallel_densify_stats_accumulate(rng):
    mesh = make_data_mesh(2)
    m = _model_from(rng, n=60, capacity=128)
    opt = OptimizationParams()
    cfg = RasterizeConfig(width=32, height=32, num_class=0,
                          max_instances=1 << 12, k_max=256, backend="jnp")
    pstep = make_parallel_train_step(mesh, cfg, opt, 3, None, False,
                                     jnp.zeros(3))
    cams = [_cam_with_gt(rng, a) for a in range(2)]
    stacked = stack_camera_batches([camera_batch(c) for c in cams])
    lrs = {k: jnp.float32(1e-3) for k in
           ["xyz", "features_dc", "features_rest", "scaling", "rotation",
            "opacity", "segment"]}
    _, _, aux, _ = pstep(m.params, m.opt_state, m.aux, stacked, lrs,
                         jax.random.PRNGKey(1))
    # each visible gaussian seen by both cameras -> denom == 2
    denom = np.asarray(aux.denom)
    assert denom.max() == 2.0
    assert np.asarray(aux.max_radii2d).max() > 0


def test_parallel_step_pallas_kernels_match_jnp(rng):
    """VERDICT r2 item 5: the Pallas composite kernels' custom VJP composed
    with shard_map's psum (the real TPU deployment shape) — interpret mode
    on the CPU mesh — must match the jnp-path parallel step."""
    from gsplat_tpu.models.gaussians import GaussianParams

    mesh = make_data_mesh(2)
    m = _model_from(rng)
    opt = OptimizationParams()
    bg = jnp.zeros(3)
    cams = [_cam_with_gt(rng, 0), _cam_with_gt(rng, 30)]
    stacked = stack_camera_batches([camera_batch(c) for c in cams])
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    key = jax.random.PRNGKey(0)

    outs = {}
    for backend in ("jnp", "pallas"):
        cfg = RasterizeConfig(width=32, height=32, num_class=0,
                              max_instances=1 << 12, k_max=256,
                              backend=backend, grad_precision="f32")
        step = make_parallel_train_step(mesh, cfg, opt, 3, None, False, bg)
        outs[backend] = step(m.params, m.opt_state, m.aux, stacked, lrs, key)

    pj, _, aj, mj = outs["jnp"]
    pp, _, ap, mp = outs["pallas"]
    np.testing.assert_allclose(float(mp["loss"]), float(mj["loss"]),
                               rtol=1e-5)
    for k in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(pp, k)), np.asarray(getattr(pj, k)),
            atol=1e-5, err_msg=f"param {k}: pallas-under-mesh != jnp")
    np.testing.assert_allclose(np.asarray(ap.xyz_gradient_accum),
                               np.asarray(aj.xyz_gradient_accum), atol=1e-4)
