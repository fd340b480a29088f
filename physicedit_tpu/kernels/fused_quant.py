"""Fused activation-quantize kernels (Pallas/TPU).

In the W4A8 DiT block every big GEMM input is produced by a cheap
elementwise/normalisation op (AdaLN modulate, approximate-GELU) and then
immediately row-quantized to int8 (kernels/quant_matmul.py).  Left to XLA,
that costs three HBM passes over the bf16 activation per site: write the
produced value, read it for the row-amax, read it again for the scaled
round.  At the production workload (B=2, S=8448, dim 3072 / mlp 12288)
those passes are ~2 ms of the ~35 ms W4A8 block.

These kernels produce the int8 values + f32 row scales in ONE pass over
the input:

    ln_mod_quant : y = LN(x)*(1+scale)+shift   -> (int8 q, f32 rowscale)
    gelu_quant   : y = x*sigmoid(1.702x)       -> (int8 q, f32 rowscale)

Numerics mirror ops/norms.py + quant_matmul.quantize_rows exactly: LN
statistics in f32, result cast to the input dtype BEFORE the affine
(ops/norms.py:25-38), quantization in f32 with scale = max(amax/127, 1e-8).
The fused path is used only for frozen quantized weights at inference
(models/dit.py gates on `lora is None`), so no VJP is defined.

Reference parity anchor: the modulate is qwen_image_dit.py:355-357, the
activation qwen_image_dit.py:42-49; quantization is our TPU compute mode
(the reference's analogue is the fp8 per-row scaling at
vram_management/layers.py:115-151).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_bm(s: int, k: int) -> int | None:
    """Largest row-block that divides S and keeps the f32 tile <= ~3 MB."""
    budget = max(786432 // k, 8)  # rows: bm * K * 4B <= 3 MB
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if bm <= budget and s % bm == 0:
            return bm
    return None


def _quantize_tail(yf):
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(yf / s), -127, 127).astype(jnp.int8)
    return q, s


def _ln_mod_quant_kernel(x_ref, sh_ref, sc_ref, q_ref, s_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32)  # [bm, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    one = jnp.asarray(1.0, x_ref.dtype)
    y = ln * (one + sc_ref[0]) + sh_ref[0]  # sc/sh blocks are [1, K]
    q, s = _quantize_tail(y.astype(jnp.float32))
    q_ref[0] = q
    s_ref[0] = s


def _gelu_quant_kernel(x_ref, q_ref, s_ref):
    # GELU math in f32: Mosaic cannot broadcast sigmoid's f32 constants
    # into bf16 vectors, and the int8 quantization absorbs the <1-ulp
    # difference vs the bf16 composition (ops/norms.py:41-43).
    xf = x_ref[0].astype(jnp.float32)
    y = xf * jax.nn.sigmoid(1.702 * xf)
    q, s = _quantize_tail(y)
    q_ref[0] = q
    s_ref[0] = s


@functools.partial(jax.jit, static_argnames=("eps", "bm"))
def _ln_mod_quant(x, shift, scale, eps, bm):
    b, s, k = x.shape
    kernel = functools.partial(_ln_mod_quant_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b, s // bm),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, 1), lambda bi, i: (bi, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ),
    )(x, shift[:, None, :], scale[:, None, :])


@functools.partial(jax.jit, static_argnames=("bm",))
def _gelu_quant(x, bm):
    b, s, k = x.shape
    return pl.pallas_call(
        _gelu_quant_kernel,
        grid=(b, s // bm),
        in_specs=[pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0))],
        out_specs=(
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, 1), lambda bi, i: (bi, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ),
    )(x)


def _transpose_quant_kernel(x_ref, q_ref, s_ref):
    xt = x_ref[0]                       # [N, bm, D] heads-major attention out
    n, bm, d = xt.shape
    y = xt.transpose(1, 0, 2).reshape(bm, n * d)
    q, s = _quantize_tail(y.astype(jnp.float32))
    q_ref[0] = q
    s_ref[0] = s


@functools.partial(jax.jit, static_argnames=("bm",))
def _transpose_quant(x, bm):
    b, n, s, d = x.shape
    return pl.pallas_call(
        _transpose_quant_kernel,
        grid=(b, s // bm),
        in_specs=[pl.BlockSpec((1, n, bm, d), lambda bi, i: (bi, 0, i, 0))],
        out_specs=(
            pl.BlockSpec((1, bm, n * d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, 1), lambda bi, i: (bi, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, n * d), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ),
    )(x)


def transpose_quant(x):
    """Fused [B, N, S, D] -> int8 [B, S, N*D] + row scales: the attention
    output's heads-to-feature transpose and the W4A8 row-quantize in one
    pass (otherwise XLA materialises the transposed bf16 copy and reads it
    twice more for amax + round).  None when the shape doesn't tile."""
    if x.ndim != 4 or (x.shape[1] * x.shape[3]) % 128 or x.shape[3] % 128:
        return None
    bm = _pick_bm(x.shape[2], x.shape[1] * x.shape[3])
    if bm is None:
        return None
    return _transpose_quant(x, bm)


def ln_mod_quant(x, shift, scale, eps: float = 1e-6):
    """Fused LN+modulate+row-quantize.

    x: [B, S, K]; shift/scale: [B, K].  Returns (q int8 [B,S,K],
    rowscale f32 [B,S,1]) or None when the shape doesn't tile (caller
    falls back to the unfused path).
    """
    if x.ndim != 3 or x.shape[-1] % 128:
        return None
    bm = _pick_bm(x.shape[1], x.shape[2])
    if bm is None:
        return None
    return _ln_mod_quant(x, shift.astype(x.dtype), scale.astype(x.dtype),
                         float(eps), bm)


def gelu_quant(x):
    """Fused approximate-GELU+row-quantize; same contract as ln_mod_quant."""
    if x.ndim != 3 or x.shape[-1] % 128:
        return None
    bm = _pick_bm(x.shape[1], x.shape[2])
    if bm is None:
        return None
    return _gelu_quant(x, bm)
