"""Worker process for the REAL multi-process multihost test
(tests/test_multihost.py::test_real_two_process_distributed).

Launched twice (process_id 0/1) with 2 local CPU devices each; initializes
jax.distributed against a shared coordinator, checks the global device set,
runs the lockstep ShardedCameraSampler, assembles a global camera batch with
make_global_batch, executes ONE data-parallel train step over the global
mesh, and prints a JSON result line for the parent test to cross-check.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

    from gsplat_tpu.parallel.multihost import init_multihost
    proc_idx, n_procs = init_multihost(coordinator_address=coord,
                                       num_processes=2, process_id=pid)
    assert proc_idx == pid and n_procs == 2

    import numpy as np
    import jax.numpy as jnp

    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.models.gaussians import GaussianModel, GaussianParams
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.parallel.data_parallel import (
        make_data_mesh, make_parallel_train_step, stack_camera_batches,
    )
    from gsplat_tpu.parallel.multihost import (
        ShardedCameraSampler, make_global_batch,
    )
    from gsplat_tpu.train.trainer import camera_batch
    from helpers import make_camera

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())

    # lockstep sampler: identical global order on both processes, disjoint
    # local slices
    probe = ShardedCameraSampler(n_cameras=6, per_process=n_local,
                                 process_index=pid, process_count=2, seed=0)
    g0 = probe.sample_global()           # step 1's global order
    sampler = ShardedCameraSampler(n_cameras=6, per_process=n_local,
                                   process_index=pid, process_count=2,
                                   seed=0)
    local1 = sampler.sample()            # this process's slice of step 1

    # deterministic toy scene (identical on both processes)
    rng = np.random.default_rng(0)
    m = GaussianModel(3, num_class=2, capacity=256)
    m.create_from_pcd(rng.standard_normal((100, 3)).astype(np.float32),
                      rng.uniform(size=(100, 3)).astype(np.float32), 1.0)
    m.training_setup()

    cams = []
    for i in range(6):
        c = make_camera(32, 32)
        c.uid = i
        c.image = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        cams.append(c)

    mesh = make_data_mesh()              # global mesh over all 4 devices
    local_batch = stack_camera_batches([camera_batch(cams[i])
                                        for i in local1])
    gbatch = make_global_batch(mesh, local_batch)
    lead = jax.tree_util.tree_leaves(gbatch)[0].shape[0]

    cfg = RasterizeConfig(width=32, height=32, num_class=0,
                          max_instances=1 << 12, k_max=256, backend="jnp")
    step = make_parallel_train_step(mesh, cfg, OptimizationParams(), 3,
                                    None, False, jnp.zeros(3))
    lrs = {k: jnp.float32(1e-3) for k in GaussianParams._fields}
    p1, o1, a1, met = step(m.params, m.opt_state, m.aux, gbatch, lrs,
                           jax.random.PRNGKey(0))
    # params are replicated — their hash must agree across processes
    xyz = np.asarray(jax.device_get(p1.xyz))
    print(json.dumps({
        "pid": pid,
        "n_local": n_local,
        "n_global": n_global,
        "global_order": g0,
        "local_slice": local1,
        "global_batch_lead": int(lead),
        "loss": float(met["loss"]),
        "xyz_sum": float(np.float64(xyz.sum())),
    }), flush=True)


if __name__ == "__main__":
    main()
