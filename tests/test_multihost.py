"""Multi-host camera sampler: lockstep determinism across processes
(SURVEY.md §7.3 — identical RNG for the densify schedule requires identical
global camera order on every process)."""
import numpy as np
import pytest

from gsplat_tpu.parallel.multihost import ShardedCameraSampler


@pytest.mark.parametrize("n_procs", [1, 2, 4])
def test_process_slices_partition_the_global_batch(n_procs):
    n_cams, per_proc, steps = 11, 2, 20
    samplers = [ShardedCameraSampler(n_cams, per_proc, p, n_procs, seed=7)
                for p in range(n_procs)]
    ref = ShardedCameraSampler(n_cams, per_proc, 0, n_procs, seed=7)
    for _ in range(steps):
        g = ref.sample_global()
        assert len(g) == per_proc * n_procs
        slices = [s.sample() for s in samplers]
        # concatenated process slices == the global batch, in order
        assert sum(slices, []) == g


@pytest.mark.parametrize("n_procs", [1, 3])
def test_epoch_coverage_and_shuffle(n_procs):
    n_cams, per_proc = 12, 2
    s = ShardedCameraSampler(n_cams, per_proc, 0, n_procs, seed=0)
    batch = per_proc * n_procs
    steps_per_epoch = n_cams // batch
    epoch1 = sum((s.sample_global() for _ in range(steps_per_epoch)), [])
    epoch2 = sum((s.sample_global() for _ in range(steps_per_epoch)), [])
    assert sorted(epoch1) == list(range(n_cams))
    assert sorted(epoch2) == list(range(n_cams))
    assert epoch1 != epoch2  # reshuffled between epochs


def test_partial_epoch_wraps_without_desync():
    # 5 cameras, global batch 4: epochs don't divide evenly; processes must
    # stay in lockstep through the wrap
    ss = [ShardedCameraSampler(5, 2, p, 2, seed=3) for p in range(2)]
    ref = ShardedCameraSampler(5, 2, 0, 2, seed=3)
    seen = []
    for _ in range(10):
        g = ref.sample_global()
        assert ss[0].sample() + ss[1].sample() == g
        seen.extend(g)
    # over 10 steps (40 draws = 8 epochs) every camera appears 8x
    counts = np.bincount(seen, minlength=5)
    assert counts.min() >= 7 and counts.max() <= 9


def test_make_global_batch_single_process():
    import jax
    import jax.numpy as jnp
    from gsplat_tpu.parallel.data_parallel import make_data_mesh
    from gsplat_tpu.parallel.multihost import make_global_batch

    mesh = make_data_mesh(4)
    local = {"x": jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)}
    g = make_global_batch(mesh, local)
    assert g["x"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(local["x"]))
