"""Render + metrics CLI end-to-end (reference render.py/metrics.py parity)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from make_synthetic_scene import make_scene


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("scene"))
    make_scene(scene_dir, n_gauss=120, n_cams=6, width=48, height=48)
    model_dir = str(tmp_path_factory.mktemp("model"))
    from gsplat_tpu.scripts.train import main as train_main
    train_main(["-s", scene_dir, "-m", model_dir, "--eval",
                "--iterations_override", "60", "--backend", "jnp",
                "--capacity", "1024", "--max_instances", str(1 << 14),
                "--save_iterations", "60", "--test_iterations", "60"])
    return scene_dir, model_dir


def test_render_cli(trained_model):
    scene_dir, model_dir = trained_model
    from gsplat_tpu.scripts.render import main as render_main
    render_main(["-m", model_dir, "--backend", "jnp",
                 "--inter_test_frames", "5"])
    rdir = os.path.join(model_dir, "test", "ours_60", "renders")
    assert len(os.listdir(rdir)) == 1  # 6 cams, llffhold 8 -> 1 test cam
    tdir = os.path.join(model_dir, "train", "ours_60", "renders")
    assert len(os.listdir(tdir)) == 5
    ddir = os.path.join(model_dir, "train", "ours_60", "depth")
    assert len(os.listdir(ddir)) == 5
    pdir = os.path.join(model_dir, "path_renders")
    assert len(os.listdir(pdir)) == 5


def test_metrics_cli(trained_model):
    scene_dir, model_dir = trained_model
    from gsplat_tpu.scripts.metrics import main as metrics_main
    metrics_main(["-m", model_dir])
    res = json.load(open(os.path.join(model_dir, "results.json")))
    m = res["ours_60"]
    assert 0 <= m["SSIM"] <= 1
    assert m["PSNR"] > 10
    assert os.path.exists(os.path.join(model_dir, "per_view.json"))


def test_pose_interpolation():
    from gsplat_tpu.viz.camera_trajectory import inter_poses
    import numpy as np
    from scipy.spatial.transform import Rotation

    R0 = np.eye(3)
    R1 = Rotation.from_euler("y", 90, degrees=True).as_matrix()
    def wv(R, t):
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        return M.T  # transposed convention
    poses = inter_poses([wv(R0, [0, 0, 0]), wv(R1, [1, 0, 0])], 5)
    assert poses.shape == (5, 4, 4)
    # midpoint rotation ~45 deg about y, translation 0.5
    mid = poses[2]
    ang = Rotation.from_matrix(mid[:3, :3].T).magnitude()
    np.testing.assert_allclose(np.rad2deg(ang), 45, atol=1.0)
    np.testing.assert_allclose(mid[3, 0], 0.5, atol=1e-5)


def test_render_cli_tile_parallel_bit_exact(trained_model):
    """--tile_parallel N renders each set image sharded by tile rows over
    the CPU mesh, bit-identical to the single-device render."""
    scene_dir, model_dir = trained_model
    from gsplat_tpu.scripts.render import main as render_main
    import numpy as np
    from PIL import Image

    base = os.path.join(model_dir, "test", "ours_60", "renders", "00000.png")
    single = np.asarray(Image.open(base)).copy()
    render_main(["-m", model_dir, "--backend", "jnp", "--skip_train",
                 "--tile_parallel", "3"])
    tiled = np.asarray(Image.open(base))
    np.testing.assert_array_equal(tiled, single)
