"""Multi-host topology: jax.distributed init + process-sharded camera sampling.

The reference is single-process/single-GPU (SURVEY.md §2.3); scaling past one
host on TPU needs (a) a one-time `jax.distributed.initialize()` handshake so
every process sees the global device set, (b) a camera sampler that gives each
process ITS slice of every global step's camera batch while keeping the
shuffle — and therefore the densification schedule's RNG (SURVEY.md §7.3) —
bit-identical on all processes with zero communication, and (c) assembly of
process-local camera batches into global arrays for the `data`-mesh step
(`jax.make_array_from_process_local_data`).

Usage (same command on every host):

    python -m gsplat_tpu.scripts.train -s <data> --data_parallel -1 \
        --multihost --coordinator_address <host0>:1234

Inside a managed TPU pod slice, `jax.distributed.initialize()` discovers the
coordinator/process-id from the environment and the flags can be omitted.
The Trainer's mesh mode is unchanged: the mesh is simply built over
`jax.devices()` (global after init); gradients pmean over ICI within a host
and DCN across hosts.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Initialize the JAX distributed runtime. Returns (proc_idx, n_procs).

    With no arguments, relies on the TPU pod environment for discovery;
    explicit values support manual bring-up (e.g. CPU multi-process tests).
    """
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


class ShardedCameraSampler:
    """Deterministic process-sharded camera sampler.

    Every process runs the identical RNG stream (seeded only by ``seed``), so
    all processes agree on the global camera order for every step without
    communicating; process ``p`` takes rows ``[p*k, (p+1)*k)`` of each global
    batch of ``k * process_count`` cameras. The shuffle semantics mirror the
    reference's random-pop stack (train.py:95-97): a global epoch is a
    permutation of all cameras, consumed batch-by-batch, reshuffled when
    fewer than one global batch remains (partial epochs wrap, so every step
    has a full batch and all processes stay in lockstep).
    """

    def __init__(self, n_cameras: int, per_process: int, process_index: int,
                 process_count: int, seed: int = 0):
        if n_cameras <= 0:
            raise ValueError("need at least one camera")
        self.n_cameras = n_cameras
        self.per_process = per_process
        self.process_index = process_index
        self.process_count = process_count
        self.global_batch = per_process * process_count
        self._rng = np.random.default_rng(seed)
        self._stack: list[int] = []

    def _refill(self):
        # identical permutation on every process: the rng stream depends
        # only on (seed, number of prior refills)
        self._stack.extend(self._rng.permutation(self.n_cameras).tolist())

    def sample_global(self) -> list[int]:
        """The full global batch for this step (same on every process)."""
        while len(self._stack) < self.global_batch:
            self._refill()
        out = self._stack[: self.global_batch]
        del self._stack[: self.global_batch]
        return out

    def sample(self) -> list[int]:
        """This process's local slice of the step's global batch."""
        g = self.sample_global()
        p = self.process_index
        return g[p * self.per_process: (p + 1) * self.per_process]


def make_global_batch(mesh, local_batch):
    """Assemble per-process stacked camera batches (leading dim = local
    device count) into global arrays for the `data`-mesh train step."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)
