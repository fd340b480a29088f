"""Decode-path (M=1 gemv) W4 kernel shootout at Qwen2.5-VL shapes.

The VL greedy decode is weight-read-bound; measured W4 decode (16.4
ms/tok) is WORSE than W8 (13.9) because the int32-widening nibble unpack
costs VPU time proportional to the whole weight matrix per token.
Candidates:
  - current fused Pallas kernel (int32 unpack)
  - AND-only Pallas kernel (offset-encoded nibbles; 2 int8 ANDs,
    correction folded into the epilogue)
  - XLA unpack + int8 dot
  - int8 (W8) dot baseline
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


from tools._bench import chain_time as _ct  # noqa: E402


def chain_time(step_fn, init, reps=3):
    return _ct(step_fn, init, chain=16, reps=reps)


# AND-only kernel (offset encoding), M=8-padded gemv
def _gemv_kernel(x_ref, wp_ref, rs_ref, out_ref, acc_scr, acc16_scr, *, nk):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        acc16_scr[:] = jnp.zeros_like(acc16_scr)

    wp = wp_ref[:]
    t = wp & jnp.int8(15)
    w_hi16 = wp & jnp.int8(-16)
    x = x_ref[:]
    k2 = wp.shape[0]
    acc_scr[:] += jax.lax.dot_general(x[:, :k2], t, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
    acc16_scr[:] += jax.lax.dot_general(x[:, k2:], w_hi16,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _finish():
        out_ref[:] = acc_scr[:] - rs_ref[:] + (acc16_scr[:] >> 4)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k2"))
def gemv_and_only(x_q, packed, block_n=1024, block_k2=None):
    m, k = x_q.shape
    k2, n = packed.shape
    if block_k2 is None:
        block_k2 = k2
    # the x BlockSpec below slices 2*block_k2 contiguous columns, which
    # only matches the global lo/hi split when there is a single k step
    assert block_k2 == k2, "gemv kernel requires full-K blocks"
    rs = 8 * jnp.sum(x_q[:, :k2].astype(jnp.int32), axis=1, keepdims=True)
    nn, nk = n // block_n, k2 // block_k2
    return pl.pallas_call(
        functools.partial(_gemv_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((m, 2 * block_k2),
                         lambda j, kk: (0, kk)),
            pl.BlockSpec((block_k2, block_n), lambda j, kk: (kk, j)),
            pl.BlockSpec((m, 1), lambda j, kk: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.int32),
                        pltpu.VMEM((m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x_q, packed, rs)


def pack_offset(w_q):
    k = w_q.shape[0]
    lo, hi = w_q[: k // 2], w_q[k // 2:]
    return ((hi.astype(np.int8) << 4)
            | ((lo + 8).astype(np.int8) & 0xF)).astype(np.int8)


def main():
    from physicedit_tpu.kernels.quant_matmul import (_unpack_w4_int8,
                                                     _w4a8_matmul)

    rng = np.random.default_rng(0)

    # correctness of the gemv kernel
    k, n = 512, 512
    wq = rng.integers(-7, 8, (k, n)).astype(np.int8)
    xq = jnp.asarray(rng.integers(-127, 128, (8, k)), jnp.int8)
    got = gemv_and_only(xq, jnp.asarray(pack_offset(wq)), block_n=512)
    want = np.asarray(xq, np.int32) @ wq.astype(np.int32)
    assert np.abs(np.asarray(got) - want).max() == 0, "gemv mismatch"
    log("gemv correctness OK")

    # VL decode shapes (per layer: qkv 3584->4608+1024, o, gate+up, down)
    shapes = [
        ("gate+up k3584  n37888", 3584, 37888),
        ("down    k18944 n3584 ", 18944, 3584),
        ("qkv     k3584  n5632 ", 3584, 5632),
    ]
    m = 8  # padded decode row
    for name, k, n in shapes:
        if k % 2:
            continue
        wq = rng.integers(-7, 8, (k, n)).astype(np.int8)
        packed_std = pack_offset(wq)   # one encoding everywhere now
        packed_off = pack_offset(wq)
        w8 = jnp.asarray(wq)
        p_std = jnp.asarray(packed_std)
        p_off = jnp.asarray(packed_off)
        x0 = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        gbytes = k * n / 2 / 1e9

        def requant(y, k=k, n=n):
            y8 = (jnp.clip(y, -1 << 20, 1 << 20) >> 13).astype(jnp.int8)
            return (jnp.roll(y8[:, :k], 1, 0) if n >= k else
                    jnp.pad(jnp.roll(y8, 1, 0), ((0, 0), (0, k - n))))

        bn = 1024 if n % 1024 == 0 else 512
        xs = jnp.ones((m, 1), jnp.float32)
        wsb = jnp.stack([jnp.ones((n,), jnp.float32),
                         jnp.zeros((n,), jnp.float32)])

        s = chain_time(lambda x: requant(gemv_and_only(x, p_off, block_n=bn)), x0)
        log(f"{name} AND-only Pallas : {s*1e3:6.2f} ms ({gbytes/s:5.0f} GB/s eq)")

        s = chain_time(lambda x: requant(_w4a8_matmul(
            x, p_std, xs, wsb, jnp.int32, block_m=8, block_n=bn,
            block_k2=512)), x0)
        log(f"{name} int32 Pallas    : {s*1e3:6.2f} ms ({gbytes/s:5.0f} GB/s eq)")

        s = chain_time(lambda x: requant(jax.lax.dot_general(
            x, _unpack_w4_int8(p_std), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), x0)
        log(f"{name} XLA unpack+dot  : {s*1e3:6.2f} ms ({gbytes/s:5.0f} GB/s eq)")

        s = chain_time(lambda x: requant(jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), x0)
        log(f"{name} W8 dot baseline : {s*1e3:6.2f} ms "
            f"({2 * gbytes/s:5.0f} GB/s eq)")


if __name__ == "__main__":
    main()
