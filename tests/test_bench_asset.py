"""The bench.py trained-scene asset path must keep working (BENCH extras).

Runs bench_trained_ply on a tiny synthetic PLY at low resolution on CPU —
guards the asset loader + config plumbing, not the numbers.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest


def test_bench_trained_ply_smoke(tmp_path):
    import bench as bench_mod
    from gsplat_tpu.models.gaussians import GaussianModel

    rng = np.random.default_rng(0)
    n = 200
    m = GaussianModel(3, num_class=2, capacity=512)
    m.create_from_pcd(
        rng.standard_normal((n, 3)).astype(np.float32) * 0.5,
        rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32),
        spatial_lr_scale=1.0)
    ply = str(tmp_path / "trained_scene.ply")
    m.save_ply(ply)

    W, H = 128, 96
    tgt = jnp.zeros((3, H, W))

    def sync(x):
        return np.asarray(jnp.ravel(jnp.stack(
            [jnp.asarray(v).ravel()[0]
             for v in __import__("jax").tree_util.tree_leaves(x)]))[0])

    def timed(f, *a, **kw):
        r = f(*a)
        return 1.0, r

    out = bench_mod.bench_trained_ply(ply, W, H, tgt, timed, sync)
    assert out["trained_n_gaussians"] == n
    assert out["trained_instances"] > 0
    assert out["trained_fwdbwd_mpix_per_s"] > 0
    assert out[f"trained_render_fps_{H}p"] > 0


def test_bench_trained_npz_smoke(tmp_path):
    """The compressed .npz asset format (geometry f32, SH bands fp16) must
    drive the same bench path."""
    import bench as bench_mod
    from gsplat_tpu.models.gaussians import GaussianModel

    rng = np.random.default_rng(1)
    n = 150
    m = GaussianModel(3, num_class=2, capacity=256)
    m.create_from_pcd(
        rng.standard_normal((n, 3)).astype(np.float32) * 0.5,
        rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32),
        spatial_lr_scale=1.0)
    alive = np.asarray(m.aux.alive)
    npz = str(tmp_path / "trained_scene_big.npz")
    np.savez_compressed(
        npz,
        xyz=np.asarray(m.params.xyz)[alive],
        scaling=np.asarray(m.params.scaling)[alive],
        rotation=np.asarray(m.params.rotation)[alive],
        opacity=np.asarray(m.params.opacity)[alive],
        features_dc=np.asarray(m.params.features_dc)[alive]
        .astype(np.float16),
        features_rest=np.asarray(m.params.features_rest)[alive]
        .astype(np.float16))

    W, H = 128, 96
    tgt = jnp.zeros((3, H, W))

    def sync(x):
        return np.asarray(jnp.ravel(jnp.stack(
            [jnp.asarray(v).ravel()[0]
             for v in __import__("jax").tree_util.tree_leaves(x)]))[0])

    def timed(f, *a, **kw):
        r = f(*a)
        return 1.0, r

    out = bench_mod.bench_trained_ply(npz, W, H, tgt, timed, sync)
    assert out["trained_n_gaussians"] == n
    assert out["trained_instances"] > 0
