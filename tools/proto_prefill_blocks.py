"""Probe the fused W4A8 kernel at VL-prefill shapes: AND-only (2 int32
accumulators) vs int32-unpack (1 accumulator) on the SAME offset
encoding, across block sizes."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _i32_kernel(xlo_ref, xhi_ref, wp_ref, xs_ref, wsb_ref, out_ref,
                acc_scr, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    wp = wp_ref[:].astype(jnp.int32)
    w_lo = ((wp & 15) - 8).astype(jnp.int8)
    w_hi = (wp >> 4).astype(jnp.int8)
    acc_scr[:] += jax.lax.dot_general(xlo_ref[:], w_lo, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
    acc_scr[:] += jax.lax.dot_general(xhi_ref[:], w_hi, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _finish():
        out_ref[:] = (acc_scr[:].astype(jnp.float32) * xs_ref[:]
                      * wsb_ref[0:1, :] + wsb_ref[1:2, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk2"))
def i32_matmul(x_q, packed, x_scale, wsb, bm, bn, bk2):
    m, k = x_q.shape
    k2, n = packed.shape
    nm, nn, nk = m // bm, n // bn, k2 // bk2
    return pl.pallas_call(
        functools.partial(_i32_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk2), lambda i, j, kk, nk=nk: (i, kk + nk)),
            pl.BlockSpec((bk2, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((2, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_q, x_q, packed, x_scale, wsb)


from tools._bench import chain_time  # noqa: E402


def main():
    from physicedit_tpu.kernels.quant_matmul import (_w4a8_matmul,
                                                     quantize_weight_int4)

    rng = np.random.default_rng(0)
    # VL prefill shapes: M=1536
    shapes = [("gate+up m1536 k3584 n37888", 1536, 3584, 37888),
              ("down   m1536 k18944 n3584", 1536, 18944, 3584)]
    for name, m, k, n in shapes:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        p = quantize_weight_int4(jnp.asarray(w))
        xs = jnp.ones((m, 1), jnp.float32)
        wsb = jnp.stack([p["w_scale"], jnp.zeros((n,), jnp.float32)])
        x0 = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        flops = 2 * m * k * n

        def wrap(y, k=k, n=n):
            y8 = jnp.clip(y * 8.0, -127, 127).astype(jnp.int8)
            return (jnp.roll(y8[:, :k], 1, 0) if n >= k else
                    jnp.pad(jnp.roll(y8, 1, 0), ((0, 0), (0, k - n))))

        for bm, bn, bk2 in [(512, 1024, 512), (512, 512, 512),
                            (256, 1024, 512), (1536, 512, 512),
                            (512, 1024, 256)]:
            if m % bm or n % bn or (k // 2) % bk2:
                continue
            try:
                s = chain_time(lambda x, bm=bm, bn=bn, bk2=bk2: wrap(
                    _w4a8_matmul(x, p["w4"], xs, wsb, jnp.bfloat16,
                                 block_m=bm, block_n=bn, block_k2=bk2)), x0)
                log(f"{name} ANDx2acc bm{bm} bn{bn} bk2{bk2}: {s*1e3:6.2f} ms "
                    f"({flops/s/1e12:5.1f} TOPS)")
                s = chain_time(lambda x, bm=bm, bn=bn, bk2=bk2: wrap(
                    i32_matmul(x, p["w4"], xs, wsb, bm, bn, bk2)), x0)
                log(f"{name} i32x1acc bm{bm} bn{bn} bk2{bk2}: {s*1e3:6.2f} ms "
                    f"({flops/s/1e12:5.1f} TOPS)")
            except Exception as e:  # noqa: BLE001
                log(f"{name} bm{bm} bn{bn} bk2{bk2}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
