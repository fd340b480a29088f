"""Multi-host helpers on the virtual 8-device mesh (single-process mode).

True multi-process runs need a pod; these tests pin the single-process
degradation paths and the sharding layouts that GSPMD sees either way.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from physicedit_tpu.parallel import multihost as mh
from physicedit_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def test_create_hybrid_mesh_single_process():
    mesh = mh.create_hybrid_mesh(4, 2)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.shape == (4, 2)


def test_host_local_batch_slice_single_process():
    start, size = mh.host_local_batch_slice(16)
    assert (start, size) == (0, 16)


def test_global_batch_assembly_and_reduction():
    mesh = mh.create_hybrid_mesh(4, 2)
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "y": np.ones((8,), np.float32),
    }
    placed = mh.global_batch_from_host_shards(batch, mesh)
    assert placed["x"].sharding.spec == P(DATA_AXIS)
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])

    # a jitted mean over the sharded batch matches the host computation
    with mesh:
        out = jax.jit(lambda b: jnp.mean(b["x"] * b["y"][:, None]))(placed)
    assert float(out) == float(np.mean(batch["x"]))


def test_initialize_distributed_noop_single_process():
    mh.initialize_distributed()  # must not raise or hang
    assert jax.process_count() == 1
