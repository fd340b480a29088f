"""Multi-host helpers on the virtual 8-device mesh (single-process mode).

True multi-process runs need a pod; these tests pin the single-process
degradation paths and the sharding layouts that GSPMD sees either way.
"""

import pytest
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


@pytest.mark.slow
def test_two_process_hybrid_mesh_grad():
    """REAL multi-process evidence: two OS processes, each owning 4 CPU
    devices, build the hybrid mesh via parallel/multihost.py and run a
    data-parallel gradient whose psum crosses the process boundary
    (tests/multihost_worker.py)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # pick a free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(root, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
