"""Prototype: bf16 score tile in the fixed-max DiT attention kernel.

The shipped kernel (kernels/flash_attention.py::_fixedmax_kernel) emits
QK^T as fp32, adds the key bias, exp2's, row-sums and casts p back to
bf16 for the PV matmul — four full VPU passes over a
[768, 8448] fp32 tile (25.9 MB) per (head, q-tile) program.  This proto
measures the same kernel with the score tile held in bf16 end to end:

  v0  shipped fp32-score fixed-max (single-k-block, prescaled, no clamp)
  v1  QK^T emitted bf16, bias add + exp2 in bf16, p fed to PV with no
      cast; l accumulated fp32 via sum(dtype=fp32)
  v2  QK^T emitted fp32, exp2 fp32, but NO bias add (ceiling for any
      bias-elision scheme at single-k-block)

plus a max-abs-error check of v1 against an fp64-free fp32 reference
softmax on a small slice.  Interleaved timings (the tunnelled runtime
drifts ~10% run to run).

RESULT (measured, one v5e chip, B=2 N=24 S=8448 D=128, block_q=768,
single k-block):
    v0 fp32-score : 14.26-14.46 ms (121-123 TF)
    v1 bf16-score : 14.12-14.18 ms (124 TF)   max|err| == v0's
    v2 fp32 nobias: 14.07-14.08 ms (125 TF)
NEGATIVE: the bf16 score tile buys ~1%, and even deleting the bias add
entirely (v2, the ceiling for any bias-elision scheme) buys ~1.3%.  The
kernel is MXU-bound at ~124 TF (63% of the 197 TF bf16 peak at these
tile aspect ratios), not VPU-pass-bound — halving the score-tile element
passes does not move it.  Kept as a record; not integrated.

DEFINITIVE (second run, with v3 exp-no-sum and v4 matmuls-only):
    v0 full kernel : 15.11 ms   v3 exp-no-sum : 14.68 ms
    v2 no bias     : 14.80 ms   v4 matmul-only: 14.81 ms
v4 strips EVERY softmax op (no exp, no sum, no normalize) and times the
same as the full kernel: the whole softmax is hidden behind the MXU.
The ~118-124 TF plateau is the MXU's fp32-accumulate emit rate at these
shapes (both matmuls must emit fp32 — QK for softmax numerics, PV for
the cross-k-block accumulator), not schedulable from Pallas.  The
attention lever is CLOSED at the kernel level.

Usage: python tools/proto_attn_bf16s.py
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
from physicedit_tpu.kernels import flash_attention as fa


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bf16s_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, l_scr, acc_scr,
                  *, bk_total):
    """Fixed-max with the score tile in bf16 (q pre-scaled by
    log2(e)/sqrt(d) wrapper-side, bias pre-cast bf16)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    p = jnp.exp2(s + bias_ref[0, 0][None, :])            # bf16 VPU chain
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True,
                            dtype=jnp.float32)
    acc_scr[:] += jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
                         ).astype(out_ref.dtype)


def _nobias_kernel(q_ref, k_ref, v_ref, out_ref, l_scr, acc_scr,
                   *, bk_total):
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
    p = jnp.exp2(s)
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
                         ).astype(out_ref.dtype)


def _noexp_kernel(q_ref, k_ref, v_ref, out_ref, l_scr, acc_scr,
                  *, bk_total):
    """MXU ceiling: both matmuls, NO exp/sum/normalize (garbage values)."""
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
    acc_scr[:] += jax.lax.dot_general(s.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = acc_scr[:].astype(out_ref.dtype)


def _expnosum_kernel(q_ref, k_ref, v_ref, out_ref, l_scr, acc_scr,
                     *, bk_total):
    """exp kept, row-sum/normalize dropped: isolates the sum cost."""
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
    p = jnp.exp2(s)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = acc_scr[:].astype(out_ref.dtype)


def _call(kernel, q, k, v, extras, block_q, block_k, n_scratch_l=128):
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
    ]
    if extras:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)))
    return pl.pallas_call(
        functools.partial(kernel, bk_total=nk),
        grid=(b, n, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, n_scratch_l), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, *extras)


def main():
    b, n, s, d = 2, 24, 8448, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = jax.jit(lambda k: (jax.random.normal(k, (b, n, s, d), jnp.bfloat16)
                            * 0.1))
    q0, k0, v0 = mk(kq), mk(kk), mk(kv)
    jax.block_until_ready((q0, k0, v0))
    log("inputs ready")
    mask_np = np.ones((b, s), bool)
    mask_np[:, -64:] = False
    mask = jnp.asarray(mask_np)
    key_bias = jnp.where(mask[:, None, :], 0.0, fa.NEG_INF
                         ).astype(jnp.float32)
    key_bias_bf = key_bias.astype(jnp.bfloat16)
    flops = 4 * b * n * s * s * d
    scale = jnp.asarray(fa.LOG2E / (d ** 0.5), jnp.bfloat16)

    # -- numerics: v1 vs fp32 reference on one head -------------------------
    def ref_head(qh, kh, vh):
        sref = (qh.astype(jnp.float32) @ kh.astype(jnp.float32).T
                ) / (d ** 0.5)
        sref = jnp.where(mask[0][None, :], sref, -1e30)
        p = jax.nn.softmax(sref, axis=-1)
        return p @ vh.astype(jnp.float32)

    log("ref...")
    o_ref = jax.block_until_ready(ref_head(q0[0, 0], k0[0, 0], v0[0, 0]))
    log("v1...")
    o_v1 = _call(_bf16s_kernel, (q0 * scale)[:1, :1], k0[:1, :1], v0[:1, :1],
                 (key_bias_bf[:1],), 768, s)[0, 0].astype(jnp.float32)
    o_v1 = jax.block_until_ready(o_v1)
    log("v0...")
    o_v0 = fa._fixedmax_bnsd((q0 * scale.astype(jnp.float32).astype(
        jnp.bfloat16))[:1, :1], k0[:1, :1], v0[:1, :1], key_bias[:1],
        768, s, clamp=False, prescaled=True)[0, 0].astype(jnp.float32)
    sc = float(jnp.std(o_ref))
    log(f"max|v1-ref| = {float(jnp.max(jnp.abs(o_v1 - o_ref))):.5f}  "
        f"(std {sc:.4f}); max|v0-ref| = "
        f"{float(jnp.max(jnp.abs(o_v0 - o_ref))):.5f}")

    # -- timing -------------------------------------------------------------
    def run_v0(c):
        qs = c[0] * scale
        o = fa._fixedmax_bnsd(qs, c[1], c[2], key_bias, 768, s,
                              clamp=False, prescaled=True)
        return (o * 0.999, c[1], c[2])

    def run_v1(c):
        qs = c[0] * scale
        o = _call(_bf16s_kernel, qs, c[1], c[2], (key_bias_bf,), 768, s)
        return (o * 0.999, c[1], c[2])

    def run_v2(c):
        qs = c[0] * scale
        o = _call(_nobias_kernel, qs, c[1], c[2], (), 768, s)
        return (o * 0.999, c[1], c[2])

    def run_v3(c):
        qs = c[0] * scale
        o = _call(_expnosum_kernel, qs, c[1], c[2], (), 768, s)
        return (o * 0.999, c[1], c[2])

    def run_v4(c):
        qs = c[0] * scale
        o = _call(_noexp_kernel, qs, c[1], c[2], (), 768, s)
        return (o * 0.999, c[1], c[2])

    init = (q0, k0, v0)
    for rep in range(2):
        for name, fn in (("v0 fp32-score ", run_v0),
                         ("v1 bf16-score ", run_v1),
                         ("v2 fp32 nobias", run_v2),
                         ("v3 exp, no sum", run_v3),
                         ("v4 matmul-only", run_v4)):
            try:
                t = chain_time(fn, init, chain=6)
                log(f"{name}: {t*1e3:6.2f} ms ({flops/t/1e12:5.1f} TF)")
            except Exception as e:  # noqa: BLE001
                log(f"{name}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
