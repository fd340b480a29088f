"""Pin the actual MXU int8 rate on this chip: standalone XLA dots and
Pallas int8 kernels at the DiT fc1 shape (M=16384, K=3072, N=12288).

bf16 peak (v5e): 197 TFLOPS -> 6.27 ms; int8 peak 394 TOPS -> 3.14 ms.

Usage: python tools/proto_int8_rate.py
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


M, K, N = 16384, 3072, 12288
FLOPS = 2 * M * K * N


def _mm_kernel(x_ref, w_ref, out_ref, acc_scr, *, nk, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_scr.dtype)

    @pl.when(kk == nk - 1)
    def _finish():
        out_ref[:] = acc_scr[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "acc", "vm"))
def pallas_mm(x, w, bm, bn, bk, acc, vm=100):
    m, k = x.shape
    _, n = w.shape
    nm, nn, nk = m // bm, n // bn, k // bk
    acc_dt = jnp.int32 if acc == "i32" else jnp.float32
    kernel = functools.partial(_mm_kernel, nk=nk,
                               out_dtype=jnp.bfloat16 if acc == "f32"
                               else jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (m, n), jnp.bfloat16 if acc == "f32" else jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vm * 1024 * 1024),
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-7, 8, size=(K, N)), jnp.int8)

    # XLA dots.  bf16 step chains via a cheap row-slice feedback.
    @jax.jit
    def xla_bf16(c):
        x, w = c
        o = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return ((x + o[:, :K].astype(jnp.bfloat16) * 1e-6), w)

    t = chain_time(xla_bf16, (xb, wb), chain=6)
    log(f"XLA bf16 dot:            {t*1e3:6.2f} ms ({FLOPS/t/1e12:5.1f} TF)")

    @jax.jit
    def xla_int8(c):
        x, w = c
        o = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x2 = (x.astype(jnp.int32) + (o[:, :K] & 1)).astype(jnp.int8)
        return (x2, w)

    t = chain_time(xla_int8, (xi, wi), chain=6)
    log(f"XLA int8 dot (i32 acc):  {t*1e3:6.2f} ms ({FLOPS/t/1e12:5.1f} TF)")

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="")
    tiles = [tuple(map(int, t.split("x")))
             for t in ap.parse_args().tiles.split(",") if t] or [
        (8192, 1536, 1024), (4096, 3072, 768), (4096, 2048, 1536),
        (8192, 2048, 1024), (4096, 1536, 3072), (16384, 1536, 1536)]
    for bm, bn, bk in tiles:
        if M % bm or N % bn or K % bk:
            continue
        for name, x, w, acc in (("int8/i32", xi, wi, "i32"),):
            try:
                if acc == "f32":
                    def step(c, bm=bm, bn=bn, bk=bk):
                        o = pallas_mm(c[0], c[1], bm, bn, bk, "f32")
                        return (c[0] + o[:, :K] * 1e-6, c[1])
                else:
                    def step(c, bm=bm, bn=bn, bk=bk):
                        o = pallas_mm(c[0], c[1], bm, bn, bk, "i32")
                        return ((c[0].astype(jnp.int32)
                                 + (o[:, :K] & 1)).astype(jnp.int8), c[1])
                t = chain_time(step, (x, w), chain=6)
                log(f"pallas {name} ({bm},{bn},{bk}): {t*1e3:6.2f} ms "
                    f"({FLOPS/t/1e12:5.1f} TF)")
            except Exception as e:  # noqa: BLE001
                log(f"pallas {name} ({bm},{bn},{bk}): FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
