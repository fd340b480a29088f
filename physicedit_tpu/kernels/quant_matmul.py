"""Packed-int4-weight matmul kernels (Pallas/TPU).

The TPU answer to the reference's low-precision compute + CPU-offload VRAM
manager (diffsynth/vram_management/layers.py:95-171): the 20B-param DiT in
bf16 (40.7 GB) exceeds the 16 GB of one v5e chip, and the tunnelled host
link (~1.4 GB/s measured) is far too slow for per-block weight streaming.
Int4 weights (10.2 GB) keep the whole model HBM-resident.  NB the value
is RESIDENCY, not MXU rate: standalone int8 and bf16 dots measure the
SAME speed at the DiT shapes (XLA/Mosaic lower int8 matmul through the
bf16 MXU path with f32 accumulation; the marketed int8 double rate never
materialises — BASELINE.md "Remaining levers").

jnp.int4 is unusable on this stack (dot_general recursion bug; and the
device layout is byte-per-element, so no memory win), so nibbles are
hand-packed two-per-int8-byte along the contraction axis, with the low
nibble OFFSET-encoded so both planes unpack with a single bitwise AND
(Mosaic cannot lower int8 vector shifts or subs, only bitwise ops):

    packed[k, n] = (w_q[k + K/2, n] << 4) | (w_q[k, n] + 8)     k < K/2

    t      = packed & 15      # == w_lo + 8      (int8 AND)
    w_hi16 = packed & -16     # == 16 * w_hi     (two's complement exact)

The kernel dots the two contiguous K-halves of the activation against
these planes into two int32 accumulators; the epilogue recovers the exact
result as  acc_lo - 8*rowsum(x_lo) + (acc_hi >> 4)  (the rowsum is one
cheap XLA pass outside the kernel; acc_hi is a multiple of 16 so the
shift is exact).  This keeps the per-weight-tile VPU unpack at two int8
ANDs — the win shows at decode (M=1), where unpack cost over the whole
weight matrix per token is what made int4 slower than int8.

Weights are quantized per-output-channel symmetric to [-7, 7];
activations per-row symmetric int8 (same scheme as ops/quant.py W8A8).
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def quantize_weight_int4(w: jax.Array) -> dict:
    """[K, N] float -> {'w4': int8 [K/2, N] packed nibbles, 'w_scale': f32 [N]}.

    K must be even (all DiT/VL projection dims are multiples of 256).
    Low nibble is offset-encoded (+8) — see module docstring.
    """
    k = w.shape[0]
    assert k % 2 == 0, f"contraction dim {k} must be even for nibble packing"
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = ((hi << 4) | ((lo + 8) & 0xF)).astype(jnp.int8)
    return {"w4": packed, "w_scale": scale[0]}


def quantize_rows(x: jax.Array):
    """[..., K] float -> (int8 values, f32 per-row scales [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _w4a8_kernel_i32(xlo_ref, xhi_ref, wp_ref, xs_ref, wsb_ref,
                     out_ref, acc_scr, *, nk):
    """Single-accumulator variant: unpack via int32 widening (one scratch,
    better VMEM pipelining at medium-M compute-bound shapes)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    wp = wp_ref[:].astype(jnp.int32)
    w_lo = ((wp & 15) - 8).astype(jnp.int8)
    w_hi = (wp >> 4).astype(jnp.int8)
    acc_scr[:] += jax.lax.dot_general(
        xlo_ref[:], w_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_scr[:] += jax.lax.dot_general(
        xhi_ref[:], w_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _finish():
        out_ref[:] = (acc_scr[:].astype(jnp.float32) * xs_ref[:]
                      * wsb_ref[0:1, :] + wsb_ref[1:2, :]).astype(out_ref.dtype)


def _w4a8_kernel(xlo_ref, xhi_ref, wp_ref, xs_ref, wsb_ref, rs_ref, out_ref,
                 acc_scr, acc16_scr, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        acc16_scr[:] = jnp.zeros_like(acc16_scr)

    # AND-only unpack (module docstring): two int8 bitwise ops, no int32
    # widening — Mosaic cannot lower int8 vector shifts/subs.
    wp = wp_ref[:]                        # [bk2, bn] packed int8
    t = wp & jnp.int8(15)                 # w_lo + 8
    w_hi16 = wp & jnp.int8(-16)           # 16 * w_hi
    acc_scr[:] += jax.lax.dot_general(
        xlo_ref[:], t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc16_scr[:] += jax.lax.dot_general(
        xhi_ref[:], w_hi16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _finish():
        # Fused dequant epilogue: int32 acc never leaves VMEM (an [M, N]
        # int32 materialisation would be 0.8 GB at the fc1 workload).
        # acc16 is a multiple of 16, so the shift is exact; rs is the
        # 8*rowsum offset correction.
        acc = acc_scr[:] - rs_ref[:] + (acc16_scr[:] >> 4)
        out_ref[:] = (acc.astype(jnp.float32) * xs_ref[:]
                      * wsb_ref[0:1, :] + wsb_ref[1:2, :]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k2",
                                    "out_dtype", "variant"))
def _w4a8_matmul(x_q, packed, x_scale, wsb, out_dtype,
                 block_m=512, block_n=1024, block_k2=512, variant="and"):
    """x_q: [M, K] int8; packed: [K/2, N] int8; x_scale: [M, 1] f32;
    wsb: [2, N] f32 (row 0 = weight scales, row 1 = bias or zeros)
    -> [M, N] out_dtype, dequantized.

    The two K-halves of x are fed as two views of the same buffer with
    offset index maps, matched against the low/high nibble planes.
    variant: "and" (AND-only unpack, two accumulators — wins when the
    per-token unpack VPU cost dominates, i.e. decode) or "i32" (int32
    widening, one accumulator — wins at medium-M compute-bound shapes).
    """
    m, k = x_q.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x_q.shape, packed.shape)
    nm, nn, nk = m // block_m, n // block_n, k2 // block_k2
    in_specs = [
        pl.BlockSpec((block_m, block_k2), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_m, block_k2),
                     lambda i, j, kk, nk=nk: (i, kk + nk)),
        pl.BlockSpec((block_k2, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
        pl.BlockSpec((2, block_n), lambda i, j, kk: (0, j)),
    ]
    if variant == "i32":
        kernel = functools.partial(_w4a8_kernel_i32, nk=nk)
        scratch = [pltpu.VMEM((block_m, block_n), jnp.int32)]
        operands = (x_q, x_q, packed, x_scale, wsb)
    else:
        rs = 8 * jnp.sum(x_q[:, :k2].astype(jnp.int32), axis=1, keepdims=True)
        kernel = functools.partial(_w4a8_kernel, nk=nk)
        scratch = [pltpu.VMEM((block_m, block_n), jnp.int32),
                   pltpu.VMEM((block_m, block_n), jnp.int32)]
        in_specs.append(pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)))
        operands = (x_q, x_q, packed, x_scale, wsb, rs)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*operands)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Backward: dx = (g * w_scale) @ unpack(w4)^T   (straight-through estimator
# through the activation quantizer; weights are frozen so their cotangents
# are zero).  Contraction is over N; the lo/hi nibble planes produce the
# first/second GLOBAL halves of K, which are not contiguous per tile — so
# the kernel emits two [M, K/2] planes that are concatenated outside.
# ---------------------------------------------------------------------------

def _w4_bwd_dx_kernel(g_ref, wp_ref, lo_ref, hi_ref, lo_scr, hi_scr, *, nn):
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        lo_scr[:] = jnp.zeros_like(lo_scr)
        hi_scr[:] = jnp.zeros_like(hi_scr)

    g = g_ref[:]                          # [bm, bn] bf16 (w_scale folded in)
    wp = wp_ref[:]                        # [bk2, bn] packed int8
    w_lo = ((wp & jnp.int8(15)).astype(jnp.int32) - 8).astype(g.dtype)
    w_hi = ((wp & jnp.int8(-16)).astype(jnp.int32) >> 4).astype(g.dtype)
    lo_scr[:] += jax.lax.dot_general(g, w_lo, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    hi_scr[:] += jax.lax.dot_general(g, w_hi, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ni == nn - 1)
    def _finish():
        lo_ref[:] = lo_scr[:].astype(lo_ref.dtype)
        hi_ref[:] = hi_scr[:].astype(hi_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k2", "out_dtype"))
def _w4_bwd_dx(g_scaled, packed, out_dtype, block_m, block_n, block_k2):
    """g_scaled: [M, N]; packed: [K/2, N] -> dx [M, K] in out_dtype."""
    m, n = g_scaled.shape
    k2 = packed.shape[0]
    nm, nk2, nn = m // block_m, k2 // block_k2, n // block_n
    kernel = functools.partial(_w4_bwd_dx_kernel, nn=nn)
    lo, hi = pl.pallas_call(
        kernel,
        grid=(nm, nk2, nn),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, kk, j: (i, j)),
            pl.BlockSpec((block_k2, block_n), lambda i, kk, j: (kk, j)),
        ],
        out_specs=(
            pl.BlockSpec((block_m, block_k2), lambda i, kk, j: (i, kk)),
            pl.BlockSpec((block_m, block_k2), lambda i, kk, j: (i, kk)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k2), out_dtype),
            jax.ShapeDtypeStruct((m, k2), out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_m, block_k2), jnp.float32),
            pltpu.VMEM((block_m, block_k2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(g_scaled, packed)
    return jnp.concatenate([lo, hi], axis=1)


def _zero_cotangents(tree):
    import jax.dtypes

    def z(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(z, tree)


@jax.custom_vjp
def w4a8_linear(p: dict, x: jax.Array) -> jax.Array:
    """y = dequant(int8(x) @ unpack_int4(w)) (+ b); returns x.dtype.

    p: {'w4': [K/2, N] int8, 'w_scale': [N] f32, optional 'b': [N]}.
    Arbitrary leading dims on x; M and N padded to block multiples.
    Differentiable in x (straight-through; weights are frozen) — makes
    the W4-resident 20B DiT trainable (LoRA) on one chip.
    """
    return _w4a8_linear_impl(p, x)


def _w4a8_linear_fwd(p, x):
    return _w4a8_linear_impl(p, x), (p,)


def _w4a8_linear_bwd(res, g):
    (p,) = res
    *lead, n = g.shape
    k = 2 * p["w4"].shape[0]
    x_dtype = g.dtype
    m = 1
    for s in lead:
        m *= s
    if (k // 2) % 128 or n % 128:
        dx = (g.reshape(m, n).astype(jnp.float32)
              @ _dequant_w4(p).T).reshape(*lead, k).astype(x_dtype)
        return _zero_cotangents(p), dx
    g2 = (g.reshape(m, n).astype(jnp.float32)
          * p["w_scale"].astype(jnp.float32)).astype(jnp.bfloat16)
    bm = 512 if m % 512 == 0 else (256 if (m % 256 == 0 or m >= 256)
                                   else _round_up(max(m, 8), 8))
    bn = 1024 if n % 1024 == 0 else (512 if n % 512 == 0 else
                                     (256 if n % 256 == 0 else 128))
    bk2 = 512 if p["w4"].shape[0] % 512 == 0 else (
        256 if p["w4"].shape[0] % 256 == 0 else 128)
    pad_m = _round_up(m, bm) - m
    if pad_m:
        g2 = jnp.pad(g2, ((0, pad_m), (0, 0)))
    dx = _w4_bwd_dx(g2, p["w4"], jnp.dtype(x_dtype), bm, bn, bk2)
    if pad_m:
        dx = dx[:m]
    return _zero_cotangents(p), dx.reshape(*lead, k).astype(x_dtype)


w4a8_linear.defvjp(_w4a8_linear_fwd, _w4a8_linear_bwd)


def _dequant_w4(p):
    """XLA-side unpack for shapes below Mosaic's 128-lane tile minimum."""
    wp = p["w4"].astype(jnp.int32)
    w_lo = (wp & 15) - 8
    w_hi = wp >> 4
    return (jnp.concatenate([w_lo, w_hi], axis=0).astype(jnp.float32)
            * p["w_scale"].astype(jnp.float32))


def _unpack_w4_int8(packed):
    """[K/2, N] packed -> [K, N] int8 (XLA path: int8 shifts/subs are
    legal outside Mosaic; low nibble is offset-encoded +8)."""
    lo = ((packed & jnp.int8(15)) - jnp.int8(8)).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


# "pallas": fused kernel (int4 stays packed to VMEM; lowest HBM traffic).
# "xla": unpack to an int8 scratch + XLA int8 dot (XLA's int8 matmul
# schedule beats the Pallas kernel at large-M DiT shapes: 38.6 vs 39.5
# ms/block measured, tools/measure_w4_block.py — at the cost of an extra
# HBM round-trip over the weights, which is why small-M (decode) calls
# still route to the fused kernel below regardless of this default).
_W4A8_IMPL = os.environ.get("PHYSICEDIT_W4A8_IMPL", "xla")
# Minimum M for the XLA unpack+dot route (below it the fused Pallas kernel's
# 0.5 byte/weight reads win; decode-size calls must stay on it).
_W4A8_XLA_MIN_M = int(os.environ.get("PHYSICEDIT_W4A8_XLA_MIN_M", "8192"))


def set_w4a8_impl(name: str, xla_min_m: int | None = None):
    global _W4A8_IMPL, _W4A8_XLA_MIN_M
    assert name in ("pallas", "xla"), name
    _W4A8_IMPL = name
    if xla_min_m is not None:
        _W4A8_XLA_MIN_M = xla_min_m


def _w4a8_linear_impl(p: dict, x: jax.Array) -> jax.Array:
    *lead, k = x.shape
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)
    k2, n = p["w4"].shape
    if k2 % 128 or n % 128:
        # tiny layer below the Mosaic lane minimum: dense XLA fallback
        out = x2.astype(jnp.float32) @ _dequant_w4(p)
        if "b" in p:
            out = out + p["b"].astype(jnp.float32)
        return out.reshape(*lead, n).astype(x.dtype)
    xq, xs = quantize_rows(x2)
    return _w4a8_from_q(p, xq, xs, lead, x.dtype)


def w4a8_linear_q(p: dict, xq: jax.Array, xs: jax.Array, out_dtype) -> jax.Array:
    """W4A8 linear on pre-quantized activations.

    xq: [..., K] int8 rows; xs: [..., 1] f32 row scales (as produced by
    kernels/fused_quant.py).  Inference-only — no VJP.
    """
    *lead, k = xq.shape
    k2, n = p["w4"].shape
    assert k == 2 * k2 and k2 % 128 == 0 and n % 128 == 0, (xq.shape, p["w4"].shape)
    m = 1
    for s in lead:
        m *= s
    return _w4a8_from_q(p, xq.reshape(m, k), xs.reshape(m, 1), lead,
                        jnp.dtype(out_dtype))


def _w4a8_from_q(p: dict, xq, xs, lead, out_dtype) -> jax.Array:
    m, _ = xq.shape
    k2, n = p["w4"].shape
    # Small/medium M is weight-read-bound: the fused kernel reads 0.5
    # byte/weight vs the XLA path's 2.5 (unpack round-trip).  Measured
    # crossover: DiT M=16896 is ~2% faster via XLA (38.6 vs 39.5
    # ms/block), VL prefill M=1536 is >2x SLOWER (852 vs 391 ms) — so the
    # impl switch only applies at clearly compute-bound sizes.
    if _W4A8_IMPL == "xla" and m >= _W4A8_XLA_MIN_M:
        acc = jax.lax.dot_general(xq, _unpack_w4_int8(p["w4"]),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * xs
               * p["w_scale"].astype(jnp.float32)[None, :])
        if "b" in p:
            out = out + p["b"].astype(jnp.float32)
        return out.reshape(*lead, n).astype(out_dtype)

    def pick(dim, candidates, fallback):
        for c in candidates:
            if dim % c == 0:
                return c
        return fallback

    # large non-divisible M pads up to 256-row blocks (a full-M block
    # would blow the 16MB VMEM budget); tiny M rounds to sublane multiples
    bm = pick(m, (512, 256), 256 if m >= 256 else _round_up(max(m, 8), 8))
    if m < 256:
        # GEMV regime (decode): the kernel is DMA-stream-bound, and the
        # measured optimum is ~1-2.5 MB weight tiles, 15-25% faster than
        # the 131-262 KB defaults on the big projections
        # (tools/proto_gemv_tiles.py @ M=8: gate_up 274->208 us,
        # down 220->162, qkv 147->128).  Pick the largest divisor pair
        # under a 2.5 MB tile budget.
        bn = pick(n, (4736, 4608, 4096, 3584, 2048, 1792, 1024, 512, 256),
                  128)
        budget = 2_500_000
        bk2 = pick(k2, tuple(c for c in (4736, 2368, 1792, 896, 512, 256)
                             if c * bn <= budget), 128)
    else:
        bn = pick(n, (1024, 512, 256), 128)
        bk2 = pick(k2, (512, 256), 128)
    pad_m = _round_up(m, bm) - m
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_m), (0, 0)))
    bias = (p["b"].astype(jnp.float32) if "b" in p
            else jnp.zeros((n,), jnp.float32))
    wsb = jnp.stack([p["w_scale"].astype(jnp.float32), bias])
    out = _w4a8_matmul(xq, p["w4"], xs.astype(jnp.float32), wsb, out_dtype,
                       block_m=bm, block_n=bn, block_k2=bk2,
                       variant="and" if m < 256 else "i32")
    if pad_m:
        out = out[:m]
    return out.reshape(*lead, n)


# DiT leaves that stay bf16 in the production W4A8 config: the embed/head
# layers run once per forward (not per block) so their cost is negligible
# (~81 MB HBM, ~0.1% of the edit time), yet quantizing them dominates the
# cumulative latent divergence — the 60-block/40-step lane measures final
# rel-L2 0.054 with them int4 vs 0.011 with them bf16 (cosine 0.99855 vs
# 0.99994; tools/quant_divergence.py, BENCH_DETAIL.json quant_divergence).
DIT_OUTER_KEYS = ("img_in", "txt_in", "time_embed", "norm_out", "proj_out",
                  "txt_norm")


def quantize_tree_int4(params, min_size: int = 1 << 16,
                       skip_top: tuple = ()):
    """Replace every large linear leaf {'w': ...} with packed int4 form.

    Stacked-layer leaves (leading layer axis from lax.scan) are vmapped.
    Small leaves (norm scales, biases) stay as-is.  Top-level keys named
    in `skip_top` are left untouched (pass DIT_OUTER_KEYS for the
    production mixed-precision DiT spec).
    """
    if skip_top and isinstance(params, dict):
        kept = {k: v for k, v in params.items() if k in skip_top}
        rest = {k: v for k, v in params.items() if k not in skip_top}
        out = quantize_tree_int4(rest, min_size)
        out.update(kept)
        return out

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "size") and node["w"].ndim >= 2 \
                    and node["w"].size >= min_size:
                w = node["w"]
                if w.ndim == 2:
                    q = dict(quantize_weight_int4(w))
                else:
                    out = jax.vmap(quantize_weight_int4)(w)
                    q = {"w4": out["w4"], "w_scale": out["w_scale"]}
                for kk, v in node.items():
                    if kk != "w":
                        q[kk] = v
                return q
            return {kk: walk(v) for kk, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
