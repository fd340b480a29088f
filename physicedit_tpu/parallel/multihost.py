"""Multi-host (multi-process) mesh construction and per-host data sharding.

The reference scales multi-node with torch DDP over NCCL via Accelerate
(scripts/train/train_multigpu.sh, train_physicedit.py:517,658).  The TPU
equivalent is a hybrid mesh: the slow inter-host network (DCN) carries
only the data-parallel axis, the on-slice interconnect (ICI) carries
tensor/sequence parallelism — GSPMD then places gradient psums on DCN and
activation collectives on ICI (SURVEY.md section 5.8).

Single-process fall-back: with one process every helper degrades to the
plain single-host mesh from parallel/sharding.py, so the same trainer
code runs on 1 chip, 1 host x N chips, and M hosts x N chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from physicedit_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Start the JAX distributed runtime (multi-controller).

    On TPU pods the three arguments auto-detect from the environment;
    pass them explicitly for manual launches.  No-op for single-process
    runs with no coordinator, and tolerant of repeated calls.

    NB: must run before any other JAX API touches the backend — even
    ``jax.process_count()`` would initialise it, which is why this guard
    checks only the arguments and the distributed client state.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run: nothing to do
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def create_hybrid_mesh(n_data: int, n_model: int) -> Mesh:
    """Mesh with `data` spanning hosts (DCN x intra-host ICI) and `model`
    inside each host (ICI only).

    With P processes: data axis = P * (n_data / P per host), model axis
    stays within a host so Megatron-style activation collectives never
    cross DCN.  Falls back to a flat mesh for one process.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        devices = np.asarray(jax.devices()[: n_data * n_model])
        return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))

    assert n_data % n_proc == 0, (
        f"data axis {n_data} must divide over {n_proc} processes")
    per_host_data = n_data // n_proc
    from jax.experimental import mesh_utils

    try:
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host_data, n_model),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices())
    except ValueError:
        # Backends without slice topology attributes (multi-process CPU,
        # single-slice pods): group by process so the data axis still
        # spans hosts and the model axis stays host-local.
        by_proc: dict[int, list] = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, []).append(d)
        rows = []
        for p in sorted(by_proc):
            ds = sorted(by_proc[p], key=lambda d: d.id)
            assert len(ds) >= per_host_data * n_model, (
                f"process {p} has {len(ds)} devices, need "
                f"{per_host_data}x{n_model}")
            rows.append(np.asarray(ds[: per_host_data * n_model],
                                   dtype=object).reshape(per_host_data,
                                                         n_model))
        dev = np.concatenate(rows, axis=0)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def host_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's rows of the global batch.

    Each host loads only its own shard of the data (the per-host data
    loading the reference gets from DistributedSampler)."""
    n_proc, pid = jax.process_count(), jax.process_index()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return pid * per, per


def global_batch_from_host_shards(local_tree, mesh: Mesh):
    """Assemble per-host numpy shards into global jax.Arrays sharded on
    the `data` axis (replicated on `model`).

    local_tree leaves: [per_host_batch, ...] numpy/jax arrays holding only
    THIS host's rows.  Uses make_array_from_process_local_data, the
    multi-controller equivalent of device_put; with one process it's an
    ordinary device_put.
    """
    def place(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS) if x.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, local_tree)
