"""Prototype: int8-domain nibble unpack for the W4A8 kernel.

Current kernel unpacks packed nibbles by widening to int32 (Mosaic cannot
lower int8 vector *shifts*), paying a 4x-wider VPU pass per weight tile.
Candidate: keep everything in int8 using only and/sub (which Mosaic can
lower at int8), with the residual /16 folded into the int32 epilogue:

    encoding:  packed = (hi << 4) | (lo + 8)        lo,hi in [-7, 7]
    unpack:    t      = packed & 15                  # int8
               w_lo   = t - 8                        # int8
               w_hi16 = packed - t                   # int8 == 16*hi
    dots:      acc    += x_lo @ w_lo
               acc16  += x_hi @ w_hi16
    epilogue:  out = (acc + (acc16 >> 4)) * scales   # exact: acc16 % 16 == 0

Measures both kernels at the DiT fc1/qkv/to_out shapes and the M=1 decode
shape, plus block-size variants.  Chained-launch timing (the tunnelled
runtime dedups bit-identical launches).
"""

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


from tools._bench import chain_time  # noqa: E402


# --- candidate kernel -------------------------------------------------------

def _w4a8_i8_kernel(xlo_ref, xhi_ref, wp_ref, xs_ref, wsb_ref, rs_ref, out_ref,
                    acc_scr, acc16_scr, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        acc16_scr[:] = jnp.zeros_like(acc16_scr)

    wp = wp_ref[:]
    t = wp & jnp.int8(15)          # lo + 8 (offset-encoded low nibble)
    w_hi16 = wp & jnp.int8(-16)    # 16 * hi (two's complement exact)
    acc_scr[:] += jax.lax.dot_general(
        xlo_ref[:], t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc16_scr[:] += jax.lax.dot_general(
        xhi_ref[:], w_hi16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _finish():
        acc = acc_scr[:] - rs_ref[:] + (acc16_scr[:] >> 4)
        out_ref[:] = (acc.astype(jnp.float32) * xs_ref[:]
                      * wsb_ref[0:1, :] + wsb_ref[1:2, :]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k2", "out_dtype"))
def w4a8_i8_matmul(x_q, packed, x_scale, wsb, out_dtype,
                   block_m=512, block_n=1024, block_k2=512):
    m, k = x_q.shape
    k2, n = packed.shape
    nm, nn, nk = m // block_m, n // block_n, k2 // block_k2
    rs = 8 * jnp.sum(x_q[:, :k2].astype(jnp.int32), axis=1, keepdims=True)
    kernel = functools.partial(_w4a8_i8_kernel, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_m, block_k2),
                         lambda i, j, kk, nk=nk: (i, kk + nk)),
            pl.BlockSpec((block_k2, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((2, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32),
                        pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_q, x_q, packed, x_scale, wsb, rs)


def pack_offset(w_q):
    """[K, N] int in [-7,7] -> offset-encoded packed nibbles."""
    k = w_q.shape[0]
    lo, hi = w_q[: k // 2], w_q[k // 2:]
    return ((hi.astype(np.int8) << 4)
            | ((lo + 8).astype(np.int8) & 0xF)).astype(np.int8)


def main():
    from physicedit_tpu.kernels.quant_matmul import (_w4a8_matmul,
                                                     quantize_weight_int4)

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")

    # correctness check of the candidate encoding
    k, n, m = 512, 512, 256
    wq = rng.integers(-7, 8, (k, n)).astype(np.int8)
    packed = jnp.asarray(pack_offset(wq))
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    xs = jnp.ones((m, 1), jnp.float32)
    wsb = jnp.stack([jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)])
    want = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    got = w4a8_i8_matmul(xq, packed, xs, wsb, jnp.float32,
                         block_m=256, block_n=512, block_k2=256)
    err = np.abs(np.asarray(got) - want).max()
    log(f"correctness: max abs err = {err}")
    assert err == 0.0

    shapes = [
        ("qkv    m16384 k3072 n9216 ", 16384, 3072, 9216),
        ("to_out m16384 k3072 n3072 ", 16384, 3072, 3072),
        ("fc1    m16384 k3072 n12288", 16384, 3072, 12288),
        ("fc2    m16384 k12288 n3072", 16384, 12288, 3072),
    ]
    blockings = [(512, 1024, 512), (1024, 512, 512), (512, 512, 512),
                 (256, 1024, 512), (1024, 1024, 256), (512, 2048, 256)]
    for name, m, k, n in shapes:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        old_p = quantize_weight_int4(jnp.asarray(w))
        wq = np.clip(np.round(w / np.maximum(
            np.abs(w).max(0, keepdims=True) / 7.0, 1e-8)), -7, 7).astype(np.int8)
        new_packed = jnp.asarray(pack_offset(wq))
        xs0 = jnp.ones((m, 1), jnp.float32)
        wsb = jnp.stack([jnp.ones((n,), jnp.float32),
                         jnp.zeros((n,), jnp.float32)])
        x0 = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        flops = 2 * m * k * n

        for bm, bn, bk2 in blockings:
            if m % bm or n % bn or (k // 2) % bk2:
                continue
            try:
                def step_new(x, bm=bm, bn=bn, bk2=bk2):
                    y = w4a8_i8_matmul(x, new_packed, xs0, wsb, jnp.int8,
                                       block_m=bm, block_n=bn, block_k2=bk2)
                    return jnp.roll(y[:, :k] if n >= k else
                                    jnp.pad(y, ((0, 0), (0, k - n))), 1, 0)

                s = chain_time(step_new, x0)
                log(f"{name} NEW bm{bm:4d} bn{bn:4d} bk2{bk2:3d}: "
                    f"{s*1e3:6.2f} ms ({flops/s/1e12:6.1f} TOPS)")
            except Exception as e:  # noqa: BLE001
                log(f"{name} NEW bm{bm} bn{bn} bk2{bk2}: FAIL {type(e).__name__}")

        def step_old(x):
            y = _w4a8_matmul(x, old_p["w4"], xs0, wsb, jnp.int8,
                             block_m=512, block_n=min(n, 1024), block_k2=512)
            return jnp.roll(y[:, :k] if n >= k else
                            jnp.pad(y, ((0, 0), (0, k - n))), 1, 0)

        s = chain_time(step_old)if False else chain_time(step_old, x0)
        log(f"{name} OLD bm 512 bn{min(n,1024):4d} bk2 512: "
            f"{s*1e3:6.2f} ms ({flops/s/1e12:6.1f} TOPS)")


if __name__ == "__main__":
    main()
