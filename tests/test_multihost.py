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


def test_real_two_process_distributed(tmp_path):
    """VERDICT r3 item 9: spawn 2 REAL jax.distributed CPU processes (2
    local devices each -> 4 global) and assert the lockstep sampler +
    make_global_batch + one data-parallel train step over the global mesh
    produce identical replicated results on both processes, with the same
    global camera order the single-process sampler yields."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda r: r["pid"])
    assert r0["n_local"] == r1["n_local"] == 2
    assert r0["n_global"] == r1["n_global"] == 4
    # lockstep: identical global order, disjoint slices that partition it
    assert r0["global_order"] == r1["global_order"]
    assert r0["local_slice"] + r1["local_slice"] == r0["global_order"]
    assert r0["global_batch_lead"] == 4  # global leading dim = all devices
    # the single-process sampler must yield the same global order
    sam = ShardedCameraSampler(6, 4, 0, 1, seed=0)
    assert sam.sample_global() == r0["global_order"]
    # replicated step results identical across processes
    assert r0["loss"] == r1["loss"]
    assert r0["xyz_sum"] == r1["xyz_sum"]
    assert np.isfinite(r0["loss"])
