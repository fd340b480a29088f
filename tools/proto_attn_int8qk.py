"""Prototype: fixed-max flash attention with int8 QK^T.

q/k are RMS-normed per head in the DiT block, so per-row symmetric int8
quantization loses <0.5% on the logits; QK^T then rides the MXU int8
double rate.  PV stays bf16 (p is a fresh VPU product; quantizing it
would halve accuracy for little gain since PV is only half the MXU work
once QK is int8).

Measures vs the bf16 fixed-max kernel at the production shape and checks
numerical agreement.
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

LOG2E = 1.4426950408889634
CLAMP = 100.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, bias_ref, out_ref,
            l_scr, acc_scr, *, bk_total):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                       # [BQ, D] int8
    k = k_ref[0, 0]                       # [BK, D] int8
    v = v_ref[0, 0]                       # [BK, D] bf16
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sf = (s.astype(jnp.float32) * qs_ref[0, 0, :, :1]
          * ks_ref[0, 0, :, 0][None, :] + bias_ref[0, 0][None, :])
    p = jnp.exp2(jnp.minimum(sf, CLAMP))
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def fixedmax_int8qk(q, k, v, key_bias, block_q, block_k):
    b, n, sq, d = q.shape
    sk = k.shape[2]
    scale = LOG2E / (d ** 0.5)

    def rowquant(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)
        s = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        return xq, s

    qq, qs = rowquant(q)
    kq, ks = rowquant(k)
    # trailing 8-lane axis for TPU tiling (value replicated; lane 0 used)
    qs = jnp.broadcast_to((qs * (scale ** 0.5))[..., None], qs.shape + (8,))
    ks = jnp.broadcast_to((ks * (scale ** 0.5))[..., None], ks.shape + (8,))
    nq, nk = sq // block_q, sk // block_k
    return pl.pallas_call(
        functools.partial(_kernel, bk_total=nk),
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, 8), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
    )(qq, kq, v, qs, ks, key_bias)


from tools._bench import chain_time as _ct  # noqa: E402


def chain_time(step_fn, init, reps=3):
    return _ct(step_fn, init, chain=6, reps=reps)


def main():
    from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd

    rng = np.random.default_rng(0)
    b, n_h, s, d = 2, 24, 8448, 128
    q = jnp.asarray(rng.normal(size=(b, n_h, s, d)), jnp.bfloat16)
    key_bias = jnp.zeros((b, 1, s), jnp.float32)
    mask = jnp.ones((b, s), bool)

    # numerical agreement on a small case
    bs, ss = 1, 1024
    qs_ = jnp.asarray(rng.normal(size=(bs, 4, ss, d)), jnp.bfloat16)
    ref = flash_attention_bnsd(qs_, qs_, qs_,
                               key_mask=jnp.ones((bs, ss), bool))
    got = fixedmax_int8qk(qs_, qs_, qs_, jnp.zeros((bs, 1, ss), jnp.float32),
                          512, 512)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    log(f"agreement vs bf16 kernel: max abs {err:.4f} rel {rel:.4f}")

    att_flops = 4 * b * n_h * s * s * d
    for bq, bk in [(1408, 1408), (768, 1408), (768, 2816)]:
        def step8(x, bq=bq, bk=bk):
            return fixedmax_int8qk(x, x, x, key_bias, bq, bk) * 1.001

        t = chain_time(step8, q)
        log(f"int8qk bq={bq} bk={bk}: {t*1e3:6.2f} ms ({att_flops/t/1e12:5.1f} TF-eq)")

    def stepb(x):
        return flash_attention_bnsd(x, x, x, key_mask=mask) * 1.001

    t = chain_time(stepb, q)
    log(f"bf16 fixedmax (auto blocks): {t*1e3:6.2f} ms ({att_flops/t/1e12:5.1f} TF)")


if __name__ == "__main__":
    main()
