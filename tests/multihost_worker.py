"""Worker for the REAL two-process multi-host test (not a simulation):
each process owns 4 CPU devices; parallel/multihost.py builds the hybrid
2-host x 4-device mesh, slices the global batch per host, assembles
global arrays from process-local shards, and a data-parallel gradient
step psums across the process boundary (the trainer's DDP semantics,
reference train_physicedit.py:517,658).

Launched by tests/test_multihost.py::test_two_process_hybrid_mesh_grad.
Usage: python multihost_worker.py <pid> <nproc> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from physicedit_tpu.parallel import multihost as mh  # noqa: E402

mh.initialize_distributed(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid)
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == nproc and jax.process_index() == pid
mesh = mh.create_hybrid_mesh(n_data=4, n_model=2)
assert mesh.shape == {"data": 4, "model": 2}, mesh.shape
# model axis must stay host-local (activation collectives never cross DCN)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, "model axis crosses hosts"

start, size = mh.host_local_batch_slice(8)
assert size == 4 and start == pid * 4, (start, size)
local = np.stack([np.full((6,), float(start + i), np.float32)
                  for i in range(size)])
batch = mh.global_batch_from_host_shards({"x": local}, mesh)
assert batch["x"].shape == (8, 6)
w = jax.device_put(jnp.ones((6,), jnp.float32), NamedSharding(mesh, P()))


@jax.jit
def grad_step(w, b):
    def loss(w):
        return jnp.mean(jnp.sum(b["x"] * w, axis=-1))

    return jax.grad(loss)(w)


g = grad_step(w, batch)
# d/dw mean_i sum_j x_ij w_j = mean_i x_ij = mean(0..7) = 3.5 per feature
got = np.asarray(g.addressable_data(0))  # replicated: local copy
np.testing.assert_allclose(got, 3.5, rtol=1e-6)
print(f"proc{pid}: MULTIHOST_OK mesh={dict(mesh.shape)}", flush=True)
