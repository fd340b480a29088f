"""Chained-harness measurement: k-sub-tile interleaved fixed-max attention.

Hypothesis: the shipped fixed-max kernel at the DiT workload (B=2, N=24,
S=8448, D=128) is MXU+VPU *serialized* — QK^T (MXU) then exp/sum (VPU)
then PV (MXU) per k tile, ~5.6+3.4 us per (768, 2816) tile — and every
tile shape measures the same ~13.6-14.2 ms wall (tools/proto_attn_fast.py
with vmem_limit raised: 13.61-15.39 across 15 shapes).  Splitting the k
block into `sub` sub-tiles and issuing QK^T(j+1) before softmax/PV(j)
gives Mosaic a dependency graph that allows MXU/VPU overlap.

Bias is applied ONLY on the sub-tiles that contain the text prefix
(production layout: text tokens [0, 256) ride the FIRST k block —
models/dit.py:238-241), and only when the caller passes a mask at all.

Usage: python tools/proto_attn_interleave.py
"""

import functools
import os
import sys
import time

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

LOG2E = 1.4426950408889634


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, l_scr, acc_scr,
            *, bk_total, sub, bias_subs):
    """q pre-scaled by log2e/sqrt(d), clamp elided (production config).
    bias_subs: number of leading sub-tiles of k-block 0 that receive the
    bias add (the text prefix lives there; img columns have bias 0)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    bk_sub = k_ref.shape[2] // sub

    def score(j):
        k = k_ref[0, 0, pl.ds(j * bk_sub, bk_sub)]
        return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def softmax_pv(s, j, with_bias):
        if with_bias:
            s = s + bias_ref[0, 0, pl.ds(j * bk_sub, bk_sub)][None, :]
        p = jnp.exp2(s)
        v = v_ref[0, 0, pl.ds(j * bk_sub, bk_sub)]
        l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)

    def body(first_block):
        s_next = score(0)
        for j in range(sub):
            s_cur = s_next
            if j + 1 < sub:
                s_next = score(j + 1)   # MXU work independent of softmax(j)
            softmax_pv(s_cur, j, first_block and j < bias_subs)

    if bias_subs:
        @pl.when(ki == 0)
        def _with_bias():
            body(True)

        @pl.when(ki != 0)
        def _no_bias():
            body(False)
    else:
        body(False)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] * pl.reciprocal(l_scr[:, :1])
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "sub",
                                             "bias_subs", "vmem_mb"))
def attn_interleaved(q, k, v, key_bias, block_q=768, block_k=2816, sub=2,
                     bias_subs=1, vmem_mb=None):
    """q/k/v [B,N,S,D] (q NOT pre-scaled; scaled here), key_bias [B,1,S]
    fp32 additive (0 / -inf-like).  bias_subs=0 -> no bias input read."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    q = q * jnp.asarray(LOG2E / (d ** 0.5), q.dtype)
    kernel = functools.partial(_kernel, bk_total=nk, sub=sub,
                               bias_subs=bias_subs)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024 if vmem_mb else None),
    )(q, k, v, key_bias)


def main():
    from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd

    rng = np.random.default_rng(0)
    b, n, s, d = 2, 24, 8448, 128
    q0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    mask = np.ones((b, s), bool)
    mask[:, 200:256] = False            # 56 masked txt-pad keys (prefix)
    mask = jnp.asarray(mask)
    bias = jnp.where(mask, 0.0, -1e30)[:, None, :].astype(jnp.float32)
    flops = 4 * b * n * s * s * d

    # correctness vs the shipped kernel
    ref = flash_attention_bnsd(q0, k0, v0, key_mask=mask,
                               block_q=768, block_k=2816, clamp=False)
    for sub, bk in [(2, 2816), (4, 2816), (4, 8448)]:
        got = attn_interleaved(q0, k0, v0, bias, 768, bk, sub, bias_subs=1,
                               vmem_mb=100 if bk > 2816 else None)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        log(f"interleaved sub={sub} bk={bk} vs shipped: max abs diff {err:.2e}")

    # shipped baseline, chained
    t = chain_time(lambda c: (flash_attention_bnsd(
        c[0], c[1], c[2], key_mask=mask, block_q=768, block_k=2816,
        clamp=False) * jnp.bfloat16(0.999) + jnp.bfloat16(1e-4),
        c[1], c[2]), (q0, k0, v0), chain=6)
    log(f"shipped fixedmax (768,2816) bias: {t*1e3:6.2f} ms "
        f"({flops/t/1e12:5.1f} TF)")

    for bq, bk, sub, bs, vm in [
            (768, 2816, 1, 1, None), (768, 2816, 2, 1, None),
            (768, 2816, 4, 1, None), (768, 2816, 8, 1, None),
            (768, 8448, 4, 1, 100), (768, 8448, 8, 1, 100),
            (768, 8448, 16, 1, 100), (1408, 2816, 2, 1, 100),
            (1408, 2816, 4, 1, 100), (768, 4224, 4, 1, 100),
            (2816, 2816, 4, 1, 100), (768, 2816, 2, 0, None),
            (768, 8448, 8, 0, 100)]:
        try:
            t = chain_time(lambda c, bq=bq, bk=bk, sub=sub, bs=bs, vm=vm: (
                attn_interleaved(c[0], c[1], c[2], bias, bq, bk, sub,
                                 bias_subs=bs, vmem_mb=vm)
                * jnp.bfloat16(0.999) + jnp.bfloat16(1e-4),
                c[1], c[2]), (q0, k0, v0), chain=6)
            log(f"il bq={bq:4d} bk={bk:4d} sub={sub:2d} bias={bs}: "
                f"{t*1e3:6.2f} ms ({flops/t/1e12:5.1f} TF)")
        except Exception as e:  # noqa: BLE001
            log(f"il bq={bq} bk={bk} sub={sub} FAILED {type(e).__name__} "
                f"{str(e)[:80]}")


if __name__ == "__main__":
    main()
