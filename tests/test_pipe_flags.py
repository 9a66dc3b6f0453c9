"""The reference's pipe/debug flags must observably work (VERDICT r3 item 8):
convert_SHs_python / compute_cov3D_python route the oracle precompute paths
(gaussian_renderer/__init__.py:341-359), --detect_anomaly maps to
jax_debug_nans (train.py:302), --debug_from arms per-step finite checks with
a snapshot dump (diff_gaussian_rasterization/__init__.py:87-94)."""
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from make_synthetic_scene import make_scene


@pytest.fixture(scope="module")
def synth_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_pipe")
    return make_scene(str(d), n_gauss=120, n_cams=4, width=48, height=48,
                      num_class=2, with_depth=False)


def _scene_and_model(scene_dir, model_dir, capacity=512):
    from argparse import Namespace

    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel

    m = GaussianModel(3, num_class=2, capacity=capacity)
    args = Namespace(source_path=scene_dir, model_path=model_dir,
                     images="images", resolution=-1, white_background=False,
                     eval=False, sh_degree=3, num_class=2,
                     data_device="cpu", using_depth=False, using_seg=False,
                     able_appearance_embedding=False)
    scene = Scene(args, m, shuffle=False)
    return scene, m


def test_oracle_flags_match_default_render(synth_scene, tmp_path):
    """The python-oracle precompute paths must agree with the fused path
    (they are the same math — this is the reference's de-facto kernel
    cross-check, SURVEY §4)."""
    import jax.numpy as jnp

    from gsplat_tpu.renderer import render

    scene, m = _scene_and_model(synth_scene, str(tmp_path / "m"))
    m.active_sh_degree = 3
    cam = scene.getTrainCameras()[0]
    base = render(cam, m, backend="jnp", max_instances=1 << 13)
    for kw in ({"convert_SHs_python": True},
               {"compute_cov3D_python": True},
               {"convert_SHs_python": True, "compute_cov3D_python": True}):
        out = render(cam, m, backend="jnp", max_instances=1 << 13, **kw)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(base["render"]),
                                   rtol=1e-5, atol=1e-5, err_msg=str(kw))


def test_oracle_flags_train_cli(synth_scene, tmp_path):
    from gsplat_tpu.scripts.train import main
    model_dir = str(tmp_path / "cli_model")
    main(["-s", synth_scene, "-m", model_dir,
          "--iterations_override", "20", "--backend", "jnp",
          "--max_instances", str(1 << 13), "--capacity", "512",
          "--convert_SHs_python", "--compute_cov3D_python",
          "--test_iterations", "20", "--save_iterations", "20",
          "--disable_gui_server"])
    assert os.path.exists(os.path.join(model_dir, "train_log.jsonl"))


def test_oracle_flags_reject_parallel(synth_scene, tmp_path):
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.train.trainer import Trainer

    scene, m = _scene_and_model(synth_scene, str(tmp_path / "m2"))
    m.training_setup()
    with pytest.raises(ValueError, match="single-device"):
        Trainer(m, scene, OptimizationParams(), backend="jnp",
                convert_shs_python=True, data_parallel=-1)


def test_debug_from_snapshot_on_nan(synth_scene, tmp_path):
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.train.trainer import Trainer

    model_dir = str(tmp_path / "dbg")
    os.makedirs(model_dir, exist_ok=True)
    scene, m = _scene_and_model(synth_scene, model_dir)
    m.training_setup()
    # poison one alive gaussian's color -> NaN loss on the first step
    import jax.numpy as jnp
    fdc = m.params.features_dc.at[0].set(jnp.nan)
    m.params = m.params._replace(features_dc=fdc)

    trainer = Trainer(m, scene, OptimizationParams(), backend="jnp",
                      max_instances=1 << 13, model_path=model_dir,
                      debug_from=1)
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.train(iterations=5, log_every=1)
    assert glob.glob(os.path.join(model_dir, "snapshot_fw_*.npz"))


def test_detect_anomaly_cli_flag(synth_scene, tmp_path):
    import jax

    from gsplat_tpu.scripts.train import main
    model_dir = str(tmp_path / "anom")
    try:
        main(["-s", synth_scene, "-m", model_dir,
              "--iterations_override", "5", "--backend", "jnp",
              "--max_instances", str(1 << 13), "--capacity", "512",
              "--detect_anomaly", "--test_iterations", "5",
              "--save_iterations", "5", "--disable_gui_server"])
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
