"""End-to-end training on a synthetic NeRFstudio scene (SURVEY.md §4 tier 3:
golden tests on a small synthetic scene) — exercises Scene loading, the jit
train step, densification boundaries, save/checkpoint, and the CLI."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from make_synthetic_scene import make_scene


@pytest.fixture(scope="module")
def synth_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return make_scene(str(d), n_gauss=150, n_cams=6, width=48, height=48,
                      num_class=3, with_depth=True)


def _make_args(scene_dir, model_dir, **over):
    from argparse import Namespace
    base = dict(source_path=scene_dir, model_path=model_dir, images="images",
                resolution=-1, white_background=False, eval=False,
                sh_degree=3, num_class=3, data_device="cpu",
                using_depth=False, using_seg=False,
                able_appearance_embedding=False)
    base.update(over)
    return Namespace(**base)


def test_scene_loading(synth_scene, tmp_path):
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"))
    scene = Scene(args, m, shuffle=False)
    assert len(scene.getTrainCameras()) == 6
    assert m.num_alive == 150
    assert scene.cameras_extent > 0
    cam = scene.getTrainCameras()[0]
    assert cam.image.shape == (3, 48, 48)
    # GT images should not be empty
    assert cam.image.max() > 0.05


def test_train_loop_converges(synth_scene, tmp_path):
    import jax.numpy as jnp
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer
    from gsplat_tpu.train import losses as L
    from gsplat_tpu.renderer import render

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"),
                      using_depth=True, using_seg=True)
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 30
    opt.densification_interval = 40
    opt.opacity_reset_interval = 10_000
    opt.densify_until_iter = 100

    # NB: the reference's depth losses supervise INVERSE depth against a
    # max-normalized GT (train.py:114-141) — replicated bit-for-bit, but on
    # this tiny scene that term dominates and stalls RGB convergence in a
    # 200-iter budget, so the convergence check trains RGB+segment only;
    # the depth-loss paths are covered by test_losses.py.
    trainer = Trainer(m, scene, opt, depth_loss_choice=None,
                      use_seg=True, backend="jnp", max_instances=1 << 14,
                      model_path=str(tmp_path / "model"))
    losses = []
    trainer.train(iterations=200, log_every=10,
                  callback=lambda it, met, tr: losses.append(float(met["loss"])))
    assert len(losses) >= 10
    # loss must drop substantially on the synthetic scene
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses}"

    # render a test view and check PSNR is sensible
    cam = scene.getTrainCameras()[0]
    out = render(cam, m, backend="jnp", max_instances=1 << 14)
    img = jnp.clip(out["render"], 0, 1)
    p = float(L.psnr(img, jnp.asarray(cam.image)))
    assert p > 15.0, f"PSNR too low: {p}"
    assert out["segment"].shape == (3, 48, 48)

    # save/load roundtrip through scene.save
    scene.save(200)
    ply = os.path.join(str(tmp_path / "model"), "point_cloud",
                       "iteration_200", "point_cloud.ply")
    assert os.path.exists(ply)
    m2 = GaussianModel(3, num_class=3, capacity=2048)
    m2.load_ply(ply)
    assert m2.num_alive == m.num_alive


def test_train_cli(synth_scene, tmp_path):
    from gsplat_tpu.scripts.train import main
    model_dir = str(tmp_path / "cli_model")
    main(["-s", synth_scene, "-m", model_dir,
          "--iterations_override", "40",
          "--backend", "jnp", "--max_instances", str(1 << 14),
          "--capacity", "1024",
          "--test_iterations", "40", "--save_iterations", "40"])
    assert os.path.exists(os.path.join(model_dir, "cfg_args"))
    assert os.path.exists(os.path.join(model_dir, "point_cloud",
                                       "iteration_40", "point_cloud.ply"))
    log = [json.loads(l) for l in
           open(os.path.join(model_dir, "train_log.jsonl"))]
    assert log and log[-1]["iter"] == 40


def test_capacity_autosize_and_regrow(synth_scene, tmp_path):
    """max_instances=0 -> measured auto-sizing; an undersized capacity must
    overflow-warn and regrow (recompile) instead of silently corrupting."""
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"))
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 10_000  # no densify in this short run

    tr = Trainer(m, scene, opt, backend="jnp", model_path=str(tmp_path / "m1"))
    assert tr._auto_capacity
    tr.train(iterations=4, log_every=2)
    # measured sizing must beat the static P*8 power-of-two guess
    assert tr.max_instances == 1 << 18  # floor for this tiny scene

    # undersized explicit capacity: first step overflows, trainer regrows
    m2 = GaussianModel(3, num_class=3, capacity=1024)
    scene2 = Scene(_make_args(synth_scene, str(tmp_path / "model2")), m2,
                   shuffle=False)
    m2.training_setup()
    tr2 = Trainer(m2, scene2, opt, backend="jnp", max_instances=256,
                  model_path=str(tmp_path / "m2"))
    tr2.train(iterations=4, log_every=1)
    assert tr2.max_instances > 256


def test_compile_ahead_capacity_swap(synth_scene, tmp_path):
    """Background compile-ahead (VERDICT r1 item 6): a precompiled step for
    a larger instance capacity is adopted stall-free by _try_adopt_pending,
    and the adopted executable produces the same results as the jit path."""
    import jax
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"))
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 10_000

    tr = Trainer(m, scene, opt, backend="jnp", max_instances=1 << 14,
                 model_path=str(tmp_path / "m"))
    tr.train(iterations=2, log_every=1)
    assert tr._example_args is not None

    # kick off a background compile for a larger capacity and wait for it
    sh = m.active_sh_degree
    target = 1 << 15
    tr._precompile_async(sh, target)
    key = (sh, m.capacity, target)
    assert key in tr._pending
    tr._pending[key]["thread"].join(timeout=300)
    holder = tr._pending[key]
    assert "exe" in holder, holder.get("err")

    # adoption: needed fits under the precompiled capacity -> swap, no clear
    assert tr._try_adopt_pending(sh, (1 << 14) + 1)
    assert tr.max_instances == target
    assert key not in tr._pending

    # the adopted executable must match a freshly-jitted step bit-for-bit
    # (_example_args holds avals only — build concrete args from live state)
    import jax.numpy as jnp

    from gsplat_tpu.train.trainer import camera_batch
    params, opt_state, aux = m.params, m.opt_state, m.aux
    batch = camera_batch(scene.getTrainCameras()[0])
    lrs = {k: jnp.float32(v) for k, v in tr.lr_fn(3).items()}
    k1 = jax.random.PRNGKey(7)
    exe_out = tr._steps[key](params, opt_state, aux, batch, lrs, k1)
    jit_out = tr._build_step(sh, target)(params, opt_state, aux, batch,
                                         lrs, k1)
    for a, b in zip(jax.tree_util.tree_leaves(exe_out),
                    jax.tree_util.tree_leaves(jit_out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # two more steps run fine at the adopted capacity
    tr.train(iterations=4, log_every=1, first_iter=2)


def test_compile_ahead_adoption_requires_fit(synth_scene, tmp_path):
    """_try_adopt_pending must NOT adopt a precompiled capacity smaller than
    the needed instance demand."""
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"))
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 10_000
    tr = Trainer(m, scene, opt, backend="jnp", max_instances=1 << 14,
                 model_path=str(tmp_path / "m"))
    tr.train(iterations=2, log_every=1)
    sh = m.active_sh_degree
    tr._precompile_async(sh, 1 << 15)
    key = (sh, m.capacity, 1 << 15)
    tr._pending[key]["thread"].join(timeout=300)
    assert not tr._try_adopt_pending(sh, (1 << 15) + 1)  # too small
    assert tr.max_instances == 1 << 14


def test_train_appearance_end_to_end(synth_scene, tmp_path):
    """--able_appearance_embedding trains end-to-end (VERDICT r2 item 2):
    the CLI builds the joint appearance step, the embedding moves off its
    zero init (its gradient through the loss is live), the ckpt lands
    beside the PLY like the reference's appearance_embedding.ckpt
    (train.py:164-167), and a checkpoint resume reloads params+moments."""
    from gsplat_tpu.scripts.train import main
    model_dir = str(tmp_path / "app_model")
    main(["-s", synth_scene, "-m", model_dir,
          "--iterations_override", "30",
          "--backend", "jnp", "--max_instances", str(1 << 14),
          "--capacity", "1024", "--able_appearance_embedding",
          "--test_iterations", "30", "--save_iterations", "30",
          "--checkpoint_iterations", "30"])
    app_ply = os.path.join(model_dir, "point_cloud", "iteration_30",
                           "appearance_embedding.npz")
    assert os.path.exists(app_ply)
    ckpt = os.path.join(model_dir, "appearance_chkpnt30.npz")
    assert os.path.exists(ckpt)
    z = np.load(ckpt)
    # zero-init embedding only moves if the appearance factors change the
    # loss — this asserts the joint gradient path end-to-end
    assert np.abs(z["emb"]).max() > 0
    assert "opt_count" in z.files and int(z["opt_count"]) == 30

    # resume from the checkpoint pair: appearance Adam count continues
    main(["-s", synth_scene, "-m", model_dir,
          "--iterations_override", "35",
          "--backend", "jnp", "--max_instances", str(1 << 14),
          "--capacity", "1024", "--able_appearance_embedding",
          "--start_checkpoint", os.path.join(model_dir, "chkpnt30.npz"),
          "--test_iterations", "35", "--save_iterations", "35",
          "--checkpoint_iterations", "35"])
    z2 = np.load(os.path.join(model_dir, "appearance_chkpnt35.npz"))
    assert int(z2["opt_count"]) == 35


def test_bounded_memory_training(synth_scene, tmp_path):
    """VERDICT r2 item 6: lazy GT decode (--low_memory) + the Trainer's LRU
    device-batch cache keep pixel arrays bounded: LazyCamera retains no
    pixels on the host object, its decode matches the eager loader, and
    the trainer never caches more than gt_cache batches."""
    import numpy as np
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import LazyCamera, Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"),
                      using_depth=True, using_seg=True)
    scene = Scene(args, m, shuffle=False, lazy_images=True)
    cams = scene.getTrainCameras()
    assert isinstance(cams[0], LazyCamera)
    img = cams[0].image
    assert img.shape == (3, 48, 48)
    # pixel arrays are never retained on the camera object
    assert "image" not in cams[0].__dict__
    assert cams[0].depth is not None and cams[0].segment is not None

    # decode parity with the eager loader
    eager = Scene(_make_args(synth_scene, str(tmp_path / "model2"),
                             using_depth=True, using_seg=True),
                  GaussianModel(3, num_class=3, capacity=1024),
                  shuffle=False)
    np.testing.assert_array_equal(img, eager.getTrainCameras()[0].image)

    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 10_000
    tr = Trainer(m, scene, opt, backend="jnp", max_instances=1 << 14,
                 model_path=str(tmp_path / "m"), gt_cache=2)
    losses = []
    tr.train(iterations=12, log_every=4,
             callback=lambda it, met, tr: losses.append(float(met["loss"])))
    assert len(tr._batches) <= 2
    assert all(np.isfinite(l) for l in losses)


def test_stop_file_graceful_exit(synth_scene, tmp_path):
    """A STOP file in the model dir ends training cleanly at the next log
    tick with a checkpoint + PLY (the safe way to stop a long TPU run)."""
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.train.trainer import Trainer

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir, exist_ok=True)
    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, model_dir)
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    opt = OptimizationParams()
    opt.densify_from_iter = 10_000
    tr = Trainer(m, scene, opt, backend="jnp", max_instances=1 << 14,
                 model_path=model_dir)
    open(os.path.join(model_dir, "STOP"), "w").close()
    tr.train(iterations=20, log_every=5)
    assert os.path.exists(os.path.join(model_dir, "chkpnt5.npz"))
    assert os.path.exists(os.path.join(model_dir, "point_cloud",
                                       "iteration_5", "point_cloud.ply"))


def test_overflow_step_is_safe_noop(synth_scene, tmp_path):
    """r4 regression: an instance-capacity-overflow step must neither
    corrupt memory (the Pallas kernels' chunk ranges are clamped in-bounds)
    nor move the training state (the update is gated on the overflow flag);
    the metrics still report the overflow so the host regrows."""
    import jax
    import jax.numpy as jnp
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel, GaussianParams
    from gsplat_tpu.train.trainer import camera_batch, make_train_step
    from gsplat_tpu.ops.rasterize import RasterizeConfig

    m = GaussianModel(3, num_class=3, capacity=1024)
    args = _make_args(synth_scene, str(tmp_path / "model"))
    scene = Scene(args, m, shuffle=False)
    m.training_setup()
    cam = scene.getTrainCameras()[0]
    batch = camera_batch(cam)
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    key = jax.random.PRNGKey(0)

    for backend in ("jnp", "pallas"):
        # 256 instances is far below this scene's demand -> guaranteed
        # overflow
        cfg = RasterizeConfig(width=48, height=48, num_class=0,
                              max_instances=256, k_max=64, backend=backend)
        step = make_train_step(cfg, OptimizationParams(), 3, None, False,
                               jnp.zeros(3))
        p1, o1, a1, met = step(m.params, m.opt_state, m.aux, batch, lrs, key)
        assert bool(met["overflow"]), backend
        for k in GaussianParams._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(p1, k)), np.asarray(getattr(m.params, k)),
                err_msg=f"{backend}: param {k} moved on an overflow step")
        assert np.isfinite(np.asarray(o1.mu.xyz)).all(), backend
        np.testing.assert_array_equal(np.asarray(a1.xyz_gradient_accum),
                                      np.asarray(m.aux.xyz_gradient_accum))

    # normal-capacity step still trains (the gate is a no-op off-overflow)
    cfg = RasterizeConfig(width=48, height=48, num_class=0,
                          max_instances=1 << 14, k_max=256, backend="jnp")
    step = make_train_step(cfg, OptimizationParams(), 3, None, False,
                           jnp.zeros(3))
    p2, _, _, met2 = step(m.params, m.opt_state, m.aux, batch, lrs, key)
    assert not bool(met2["overflow"])
    assert float(jnp.abs(p2.xyz - m.params.xyz).max()) > 0
