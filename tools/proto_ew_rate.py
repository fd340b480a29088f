"""Pin the elementwise HBM streaming rate: XLA fused elementwise vs a
trivial Pallas copy/scale kernel, bf16 and fp32, at DiT activation sizes.

Motivation: tools/proto_block_glue.py measured ONE XLA elementwise pass
over the [2,8448,9216] bf16 QKV buffer at 5.47 ms = 114 GB/s effective —
7x below the 819 GB/s v5e HBM peak, while the Pallas W4 GEMV path
streams weights at ~430-500 GB/s.  If XLA elementwise lowering is
systematically slow on this backend, every unfused glue pass in the
model is ~5x overpriced and the fusion strategy must move to Pallas.

Usage: python tools/proto_ew_rate.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools._bench import chain_time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _scale_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.asarray(0.999, x_ref.dtype) \
        + jnp.asarray(1e-4, x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def pallas_scale(x, rows=1024, cols=None):
    m, n = x.shape
    cols = cols or n
    return pl.pallas_call(
        _scale_kernel,
        grid=(m // rows, n // cols),
        in_specs=[pl.BlockSpec((rows, cols), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((rows, cols), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x)


def main():
    rng = np.random.default_rng(0)
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        for m, n in ((16896, 9216), (16896, 3072), (4096, 1024)):
            nbytes = m * n * np.dtype(dtype).itemsize
            x0 = jnp.asarray(rng.normal(size=(m, n)) * 0.1, dtype)

            t = chain_time(lambda x: x * jnp.asarray(0.999, dtype)
                           + jnp.asarray(1e-4, dtype), x0, chain=8)
            log(f"XLA    ew {name} [{m:5d},{n:5d}] ({nbytes/1e6:6.0f} MB): "
                f"{t*1e3:6.2f} ms = {2*nbytes/t/1e9:5.0f} GB/s")

            for rows, cols in ((256, 1024), (512, 1024), (1024, 1024),
                               (2048, 512), (256, None), (1024, None)):
                if m % rows or (cols and n % cols):
                    continue
                blk = rows * (cols or n) * np.dtype(dtype).itemsize
                if blk > 4 * 1024 * 1024:
                    continue
                try:
                    t = chain_time(lambda x, rows=rows, cols=cols:
                                   pallas_scale(x, rows, cols), x0, chain=8)
                    log(f"pallas ew {name} [{m:5d},{n:5d}] "
                        f"blk=({rows},{cols or n}): {t*1e3:6.2f} ms = "
                        f"{2*nbytes/t/1e9:5.0f} GB/s")
                except Exception as e:  # noqa: BLE001
                    log(f"pallas ew {name} blk=({rows},{cols}): FAIL "
                        f"{type(e).__name__}")


if __name__ == "__main__":
    main()
