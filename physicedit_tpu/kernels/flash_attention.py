"""Fused flash attention for the DiT joint-attention hot loop (Pallas/TPU).

Replaces the reference's FlashAttention-3 path (qwen_image_dit.py:14-39)
with TPU-native kernels.  Two softmax variants:

- **fixed-max** (default): no running max.  The DiT RMS-norms q and k per
  head before attention (qwen_image_dit.py:341-344), so logits are bounded
  by Cauchy-Schwarz: |q.k/sqrt(d)| <= sqrt(d)*|gamma_q||gamma_k| (~11 for
  unit gammas) — far below the fp32 exp overflow point.  Softmax therefore
  needs no max subtraction; a CLAMP guards pathological weights.  This
  removes the running-max/rescale machinery from the VPU inner loop (the
  bottleneck at the 8448-token workload: measured 47 ms -> ~35 ms/call,
  faster than jax's stock flash and splash kernels at this shape).
- **online-softmax** (fallback, `variant="online"`): the canonical
  numerically-unbounded-safe kernel.

Common structure: grid (batch, heads, q_blocks, k_blocks), k innermost so
VMEM scratch accumulators persist across it; fp32 normaliser/accumulator;
bf16 QK^T and PV on the MXU; key-side padding (the CFG text mask) as a
-1e30 additive bias — finite, so fully-masked query rows stay finite and
are discarded by the caller.  exp2 with log2(e) folded into the scale.

The public wrapper pads sequence lengths to block multiples (default
blocks are chosen to divide the production 8448-token joint sequence
exactly) and falls back to XLA for head_dim != 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
# exp2(CLAMP) * 16k keys ~ 2e34 < fp32 max: no overflow even if the
# bounded-logits assumption is violated by extreme trained gammas.
CLAMP = 100.0
DEFAULT_BQ = 256
DEFAULT_BK = 1024


def _pick_blocks(sq: int, sk: int,
                 has_bias2d: bool = False) -> tuple[int, int]:
    """Largest well-performing blocks that divide the (padded) lengths.

    Measured on v5e at the 8448 workload (tools/measure_w4_block.py
    --attn-sweep): with the scoped-VMEM limit raised to use the chip's
    128 MB VMEM (CompilerParams.vmem_limit_bytes — the 16 MB default is
    what capped round 3's sweep at block_k 2816), the optimum is a
    SINGLE k-block: (768, 8448) 13.53-13.62 ms < (1408, 2816) 13.90 <
    (768, 2816) 14.06-14.34 — one softmax phase per q-tile, no
    accumulator carry across k iterations.  Larger q tiles regress
    ((1056, 8448) 14.12, (2112, 8448) 16.69).  The single-k-block mode
    is taken whenever the fp32 score tile fits a 32 MB stack budget;
    2D-bias (EliGen) calls stream a [block_q, block_k] bias tile too,
    so they stay on the multi-block path at large sk."""
    sk1 = -(-sk // 128) * 128
    if not has_bias2d and 768 * sk1 * 4 <= 32 * 1024 * 1024:
        for bq in (768, 704, 512, 384, 256, 128):
            if sq % bq == 0:
                return bq, sk1
        return 768, sk1                      # q axis tail-padded
    if sq % 768 == 0 and sk % 2816 == 0:
        return 768, 2816
    bq = 1408 if sq % 1408 == 0 else (768 if sq % 768 == 0 else DEFAULT_BQ)
    bk = 1408 if sk % 1408 == 0 else DEFAULT_BK
    return bq, bk


# ---------------------------------------------------------------------------
# Fixed-max kernel (default): p = exp2(min(s*scale + bias, CLAMP))
# ---------------------------------------------------------------------------

def _fixedmax_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, l_scr, acc_scr,
                     *, scale_log2e, bk_total, clamp=True):
    """scale_log2e=None means q arrives pre-scaled by log2(e)/sqrt(d)
    (wrapper-side, fused into the surrounding XLA elementwise chain) —
    one fewer full-score-matrix VPU multiply in the hot loop."""
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
    if scale_log2e is not None:
        s = s * scale_log2e
    sig = s + bias_ref[0, 0][None, :]
    if clamp:
        sig = jnp.minimum(sig, CLAMP)
    p = jnp.exp2(sig)
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(out_ref.dtype)


def _fixedmax_kernel_bias2d(q_ref, k_ref, v_ref, bias_ref, kbias_ref, out_ref,
                            l_scr, acc_scr, *, scale_log2e, bk_total):
    """Fixed-max with an additive [S_q, S_k] bias (EliGen entity masks);
    the bias is pre-multiplied by log2(e) in the wrapper."""
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
    s = s * scale_log2e + bias_ref[0] + kbias_ref[0, 0][None, :]
    p = jnp.exp2(jnp.minimum(s, CLAMP))
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "clamp",
                                             "prescaled"))
def _fixedmax_bnsd(q, k, v, key_bias, block_q, block_k, clamp=True,
                   prescaled=False):
    """q/k/v: [B, N, S, D] (S padded to block multiples);
    key_bias: [B, 1, S_k] fp32, 0 for valid keys / -1e30 for masked."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(_fixedmax_kernel,
                               scale_log2e=None if prescaled
                               else LOG2E / (d ** 0.5), bk_total=nk,
                               clamp=clamp)
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
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_bias)


def _fixedmax_kernel_lse(q_ref, k_ref, v_ref, bias_ref, out_ref, l_ref,
                         l_scr, acc_scr, *, scale_log2e, bk_total,
                         clamp=True):
    """Forward variant that also emits the softmax denominator l (needed
    by the backward kernels)."""
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
    if scale_log2e is not None:
        s = s * scale_log2e
    sig = s + bias_ref[0, 0][None, :]
    if clamp:
        sig = jnp.minimum(sig, CLAMP)
    p = jnp.exp2(sig)
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(out_ref.dtype)
        l_ref[0, 0] = l_scr[:, :8]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "clamp",
                                             "prescaled"))
def _fixedmax_bnsd_lse(q, k, v, key_bias, block_q, block_k, clamp=True,
                       prescaled=False):
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(_fixedmax_kernel_lse,
                               scale_log2e=None if prescaled
                               else LOG2E / (d ** 0.5), bk_total=nk,
                               clamp=clamp)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            # TPU tiling needs >=(8,128)-compatible trailing dims: l rides
            # an 8-lane tail axis (value replicated; lane 0 is used)
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, qi, ki: (b_, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, sq, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_bias)


def _fm_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dd_ref, l_ref,
                      dq_ref, dq_scr, *, scale_log2e, scale_nat, bk_total,
                      clamp=True):
    """dq = (P * (g v^T - D)) @ k * scale  (P recomputed per tile)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale_log2e is not None:
        s = s * scale_log2e
    sig = s + bias_ref[0, 0][None, :]
    p = jnp.exp2(jnp.minimum(sig, CLAMP) if clamp else sig)
    p_n = p * (1.0 / jnp.maximum(l_ref[0, 0, :, 0], 1e-30))[:, None]     # softmax weights P
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    da = p_n * (dp - dd_ref[0, 0, :, 0][:, None])
    if clamp:
        da = jnp.where(sig < CLAMP, da, 0.0)
    dq_scr[:] += jax.lax.dot_general(da.astype(k.dtype), k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ki == bk_total - 1)
    def _finish():
        dq_ref[0, 0] = (dq_scr[:] * scale_nat).astype(dq_ref.dtype)


def _fm_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dd_ref, l_ref,
                       dk_ref, dv_ref, dk_scr, dv_scr,
                       *, scale_log2e, scale_nat, bq_total, clamp=True):
    """dv = P^T g;  dk = (P * (g v^T - D))^T @ q * scale."""
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale_log2e is not None:
        s = s * scale_log2e
    sig = s + bias_ref[0, 0][None, :]
    p = jnp.exp2(jnp.minimum(sig, CLAMP) if clamp else sig)
    p_n = p * (1.0 / jnp.maximum(l_ref[0, 0, :, 0], 1e-30))[:, None]
    dv_scr[:] += jax.lax.dot_general(p_n.astype(g.dtype), g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    da = p_n * (dp - dd_ref[0, 0, :, 0][:, None])
    if clamp:
        da = jnp.where(sig < CLAMP, da, 0.0)
    dk_scr[:] += jax.lax.dot_general(da.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qi == bq_total - 1)
    def _finish():
        dk_ref[0, 0] = (dk_scr[:] * scale_nat).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "clamp",
                                    "prescaled"))
def _fm_bwd(q, k, v, key_bias, g, dd, l, block_q, block_k, clamp=True,
            prescaled=False):
    """prescaled: q is already q_orig * log2(e)/sqrt(d).  Then
    d sig/d q_s = k * ln2 and d sig/d k = q_s * ln2, so both dq (wrt the
    scaled q; the wrapper's multiply applies the outer chain rule) and dk
    carry a plain ln(2) factor instead of 1/sqrt(d)."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    scale_log2e = None if prescaled else LOG2E / (d ** 0.5)
    scale_nat = (1.0 / LOG2E) if prescaled else 1.0 / (d ** 0.5)

    dq = pl.pallas_call(
        functools.partial(_fm_bwd_dq_kernel, scale_log2e=scale_log2e,
                          scale_nat=scale_nat, bk_total=nk, clamp=clamp),
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, qi, ki: (b_, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_bias, g, dd, l)

    dk, dv = pl.pallas_call(
        functools.partial(_fm_bwd_dkv_kernel, scale_log2e=scale_log2e,
                          scale_nat=scale_nat, bq_total=nq, clamp=clamp),
        grid=(b, n, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, ki, qi: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, ki, qi: (b_, 0, ki)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, ki, qi: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, ki, qi: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, ki, qi: (b_, h, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ki, qi: (b_, h, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, n, sk, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_bias, g, dd, l)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fixedmax_diff(q, k, v, key_bias, block_q, block_k, clamp=True,
                   prescaled=False):
    """Differentiable fixed-max attention (padded shapes; key_bias is a
    non-trainable mask term — its cotangent is zero).  With
    prescaled=True, q is q_orig * log2(e)/sqrt(d); the returned dq is wrt
    the SCALED q (the wrapper multiply applies the outer chain rule)."""
    out, _ = _fixedmax_bnsd_lse(q, k, v, key_bias, block_q, block_k,
                                clamp=clamp, prescaled=prescaled)
    return out


def _fixedmax_diff_fwd(q, k, v, key_bias, block_q, block_k, clamp=True,
                       prescaled=False):
    out, l = _fixedmax_bnsd_lse(q, k, v, key_bias, block_q, block_k,
                                clamp=clamp, prescaled=prescaled)
    return out, (q, k, v, key_bias, out, l)


def _fixedmax_diff_bwd(block_q, block_k, clamp, prescaled, res, g):
    q, k, v, key_bias, out, l = res
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dd = jnp.broadcast_to(dd[..., None], dd.shape + (8,))
    dq, dk, dv = _fm_bwd(q, k, v, key_bias, g, dd, l, block_q, block_k,
                         clamp=clamp, prescaled=prescaled)
    return dq, dk, dv, jnp.zeros_like(key_bias)


_fixedmax_diff.defvjp(_fixedmax_diff_fwd, _fixedmax_diff_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _fixedmax_bnsd_bias(q, k, v, key_bias, bias, block_q, block_k):
    """Fixed-max with [B, S_q, S_k] additive bias (already scaled by log2e)."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(_fixedmax_kernel_bias2d,
                               scale_log2e=LOG2E / (d ** 0.5), bk_total=nk)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, block_q, block_k), lambda b_, h, qi, ki: (b_, qi, ki)),
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
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, bias, key_bias)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
                  m_scr, l_scr, acc_scr, *, scale, bk_total):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                      # [BQ, D] bf16
    k = k_ref[0, 0]                      # [BK, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [BQ, BK] fp32
    mask = mask_ref[0, 0]                # [BK] bool (key validity)
    s = jnp.where(mask[None, :], s, NEG_INF)

    m_prev = m_scr[:, :1]                                # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # [BQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                      # [BQ, 1]
    p = jnp.exp(s - m_new)                               # [BQ, BK] fp32
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [BQ, D]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_bnsd(q, k, v, key_mask, block_q=DEFAULT_BQ, block_k=DEFAULT_BK):
    """q/k/v: [B, N, S, D] (S padded to block multiples); key_mask: [B, 1, S]."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    scale = 1.0 / (d ** 0.5)

    kernel = functools.partial(_flash_kernel, scale=scale, bk_total=nk)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            # mask [B, 1, S_k]: middle dim kept whole to satisfy TPU tiling
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_mask)


def _flash_kernel_bias(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref,
                       m_scr, l_scr, acc_scr, *, scale, bk_total):
    """Variant with an additive [S_q, S_k] bias (EliGen entity masks)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :], s, NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == bk_total - 1)
    def _finish():
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_bnsd_bias(q, k, v, key_mask, bias, block_q=DEFAULT_BQ,
                     block_k=DEFAULT_BK):
    """q/k/v: [B, N, S, D]; key_mask: [B, 1, S]; bias: [B, S_q, S_k] fp32.

    The bias is shared across heads (the EliGen mask layout,
    qwen_image_dit.py:496 broadcasts over the head axis)."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_flash_kernel_bias, scale=scale, bk_total=nk)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, qi, ki: (b_, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
            pl.BlockSpec((1, block_q, block_k), lambda b_, h, qi, ki: (b_, qi, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e VMEM is 128 MB; the 16 MB default scoped budget is what
            # capped the round-3 tile sweep at block_k 2816
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, key_mask, bias)


# ---------------------------------------------------------------------------
# GQA causal flash attention (Qwen2.5-VL prefill / prompt encoding)
# ---------------------------------------------------------------------------
#
# The reference leans on FA3/SDPA inside HF for the VL model
# (qwen_image_text_encoder_withdecode.py via transformers internals); the
# round-2 rebuild ran prefill on dense XLA GQA attention (jnp.repeat'd K/V +
# a full [B, N, S, S] fp32 logits tensor) — measured as the slowest
# unexplained stage (549 ms W4 at S=1536, BASELINE.md).  This kernel:
#
# - reads each K/V head once per *query-head group* via the BlockSpec index
#   map (h // group) — no repeated K/V materialisation,
# - applies the causal + key-padding mask in-kernel from program ids
#   (supports the left-padded batched-reasoner layout: invalid rows come
#   out zero and are discarded by the caller),
# - skips fully-above-diagonal K blocks (`pl.when`) — ~half the MXU work,
# - online softmax (running max): Qwen has NO q/k norm, logits are
#   unbounded, so the DiT's fixed-max trick does not apply.


def _gqa_causal_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
                       m_scr, l_scr, acc_scr, *, scale, bq, bk, bk_total):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # K blocks strictly above the causal diagonal contribute nothing.
    @pl.when(ki * bk <= qi * bq + bq - 1)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        ok = (k_pos <= q_pos) & mask_ref[0, 0][None, :]
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == bk_total - 1)
    def _finish():
        # fully-masked rows (left-pad queries) have l == 0 -> output 0,
        # discarded by the caller
        out_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _gqa_causal_bnsd(q, k, v, key_mask, block_q, block_k):
    """q: [B, N, S, D]; k/v: [B, KV, S, D] with N % KV == 0 (GQA);
    key_mask: [B, 1, S] bool.  Causal attention, heads grouped onto KV heads
    via the BlockSpec index map."""
    b, n, sq, d = q.shape
    kv = k.shape[1]
    group = n // kv
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(_gqa_causal_kernel, scale=1.0 / (d ** 0.5),
                               bq=block_q, bk=block_k, bk_total=nk)
    return pl.pallas_call(
        kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h, qi, ki: (b_, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h, qi, ki: (b_, h // group, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h, qi, ki: (b_, h // group, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, qi, ki: (b_, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, qi, ki: (b_, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v, key_mask)


def gqa_causal_flash(q, k, v, key_mask, block_q: int | None = None,
                     block_k: int | None = None):
    """Causal GQA flash attention for the VL prefill hot path.

    q: [B, S, N, D]; k/v: [B, S, KV, D]; key_mask: [B, S] bool (True =
    valid key; left- OR right-padded layouts both work — causality is by
    absolute position).  Returns [B, S, N*D] (the _gqa_attention layout).
    """
    b, s, n, d = q.shape
    if block_q is None:
        block_q = 512 if s % 512 == 0 else (256 if s % 256 == 0 else 128)
    if block_k is None:
        block_k = block_q
    pad = (-s) % max(block_q, block_k)
    qt = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    mask = jnp.pad(key_mask.astype(bool), ((0, 0), (0, pad)))[:, None, :]
    out = _gqa_causal_bnsd(qt, kt, vt, mask, block_q, block_k)
    return out[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, n * d)


def flash_attention_bnsd(q, k, v, key_mask=None, bias=None,
                         block_q: int | None = None,
                         block_k: int | None = None,
                         variant: str = "fixedmax", clamp: bool = True):
    """Heads-major fused attention: q/k/v [B, N, S, D] -> [B, N, S, D].

    The layout the DiT block uses natively — no transposes; only tail
    padding to block multiples (block defaults divide the production 8448
    joint sequence exactly, zero pad waste).  `bias` is an optional
    head-shared additive [B, S_q, S_k] mask (EliGen).  `variant="online"`
    selects the running-max kernel (safe for unbounded logits).  S_q may
    differ from S_k (the slim last DiT block queries only the base-image
    rows against the full joint K/V)."""
    b, n, s, d = q.shape
    sk_in = k.shape[2]
    if block_q is None or block_k is None:
        bq_auto, bk_auto = _pick_blocks(s, sk_in, has_bias2d=bias is not None)
        block_q = block_q or bq_auto
        block_k = block_k or bk_auto
    if key_mask is None:
        key_mask = jnp.ones((b, sk_in), bool)
    pad_q = (-s) % block_q
    pad_k = (-sk_in) % block_k
    qt = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kt = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vt = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    mask = jnp.pad(key_mask.astype(bool), ((0, 0), (0, pad_k)))[:, None, :]
    if variant == "fixedmax":
        key_bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
        if bias is not None:
            bias2d = jnp.pad(bias.astype(jnp.float32) * LOG2E,
                             ((0, 0), (0, pad_q), (0, pad_k)))
            out = _fixedmax_bnsd_bias(qt, kt, vt, key_bias, bias2d,
                                      block_q=block_q, block_k=block_k)
        else:
            # differentiable path (custom VJP with Pallas backward kernels).
            # q is pre-scaled OUTSIDE the kernel (the multiply fuses into
            # the surrounding XLA elementwise chain; one fewer VPU pass
            # over the score matrix in the hot loop).  A zero-key variant
            # (masked K/V zeroed, denominator corrected by n_masked, NO
            # in-kernel bias add) measured SLOWER head-to-head
            # (tools/proto_zk_vs_bias.py: 15.5-15.8 vs 14.8-15.2 ms at the
            # 8448 workload): the bias add hides under the MXU/VPU
            # pipeline while the wrapper-side K/V zeroing pass costs
            # ~0.7 ms.  The bias kernel is the structural optimum here.
            d_ = qt.shape[-1]
            qt = qt * jnp.asarray(LOG2E / (d_ ** 0.5), qt.dtype)
            out = _fixedmax_diff(qt, kt, vt, key_bias, block_q, block_k,
                                 clamp, True)
    elif bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         ((0, 0), (0, pad_q), (0, pad_k)))
        out = _flash_bnsd_bias(qt, kt, vt, mask, bias_p,
                               block_q=block_q, block_k=block_k)
    else:
        out = _flash_bnsd(qt, kt, vt, mask, block_q=block_q, block_k=block_k)
    return out[:, :, :s]


def flash_attention(q, k, v, key_mask=None, bias=None,
                    block_q: int | None = None, block_k: int | None = None,
                    variant: str = "fixedmax"):
    """Drop-in for ops.attention.sdpa_xla: q/k/v [B, S, N, D] -> [B, S, N, D]."""
    if bias is not None or q.shape[-1] % 128 != 0:
        from physicedit_tpu.ops.attention import sdpa_xla

        return sdpa_xla(q, k, v, key_mask=key_mask, bias=bias)

    out = flash_attention_bnsd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), key_mask, block_q=block_q, block_k=block_k,
        variant=variant)
    return out.transpose(0, 2, 1, 3)
