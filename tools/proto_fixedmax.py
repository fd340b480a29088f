"""Prototype: fixed-max flash attention (no running max) for bounded logits.

RMS-normed q,k bound |q.k/sqrt(d)| <= sqrt(d)*|gamma_q||gamma_k| (~11 for
unit gammas), so softmax needs no max subtraction in fp32: p = exp2(s*c),
guarded by a clamp. Removes the running-max machinery (max pass, alpha
rescale) from the inner loop.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
CLAMP = 100.0  # exp2(100)*8448 ~ 1e34 < fp32 max


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, l_scr, acc_scr,
            *, scale_log2e, bk_total):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # scale, mask-bias, clamp, exp2 — one fused elementwise chain
    p = jnp.exp2(jnp.minimum(s * scale_log2e + bias_ref[0, 0][None, :], CLAMP))
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] * pl.reciprocal(l_scr[:, :1])).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def fixedmax_bnsd(q, k, v, key_bias, block_q=256, block_k=1408):
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(_kernel, scale_log2e=LOG2E / (d ** 0.5),
                               bk_total=nk)
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
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
    )(q, k, v, key_bias)


def main():
    rng = np.random.default_rng(0)
    b, n_h, d = 2, 24, 128
    s_all = 8448
    att_flops = 4 * b * n_h * s_all * s_all * d
    bias = jnp.zeros((b, 1, s_all), jnp.float32)

    def bench(f, reps=4):
        xs = [jnp.asarray(rng.normal(size=(b, n_h, s_all, d)) * 0.3, jnp.bfloat16)
              for _ in range(reps + 1)]
        for x in xs:
            jax.block_until_ready(x)
        f_j = jax.jit(f)
        v = float(f_j(xs[0]).sum())
        best = 1e9
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            v = float(f_j(xs[i]).sum())
            best = min(best, time.perf_counter() - t0)
        return best, v

    # numerics check vs XLA sdpa
    from physicedit_tpu.ops.attention import sdpa_bnsd
    q = jnp.asarray(rng.normal(size=(b, n_h, 512, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, n_h, 1408 * 2, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, n_h, 1408 * 2, d)), jnp.bfloat16)
    bias_s = jnp.zeros((b, 1, 1408 * 2), jnp.float32)
    out_fm = fixedmax_bnsd(q, k, v, bias_s, block_q=256, block_k=1408)
    out_ref = sdpa_bnsd(q, k, v)
    err = jnp.max(jnp.abs(out_fm.astype(jnp.float32) - out_ref.astype(jnp.float32)))
    print("max abs err vs sdpa:", float(err), file=sys.stderr)

    for bq, bk in [(256, 768), (256, 1408), (256, 2816), (384, 1408),
                   (384, 2816), (768, 1408), (768, 2816), (256, 4224),
                   (1408, 1408)]:
        if s_all % bq or s_all % bk:
            continue
        try:
            s, val = bench(lambda x, bq=bq, bk=bk: fixedmax_bnsd(
                x, x, x, bias, block_q=bq, block_k=bk))
            print(f"fixedmax bq={bq:4d} bk={bk:4d}: {s*1e3:7.2f} ms "
                  f"({att_flops/s/1e12:5.1f} TFLOPS) sum={val:.2f}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk} FAILED {type(e).__name__} {str(e)[:100]}",
                  file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
