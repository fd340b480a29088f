"""Int8 W8A8 quantized linear layers (opt-in inference mode).

The TPU analogue of the reference's fp8 compute mode
(diffsynth/vram_management/layers.py:115-151: per-row dynamic scaling into
torch._scaled_mm): weights are quantized offline per-output-channel,
activations per-row at run time.  The win is halved weight HBM traffic —
measured, the int8 dot itself runs at the same MXU rate as bf16 on this
chip (kernels/quant_matmul.py docstring, BASELINE.md).

Quantized params replace the 'w' leaf with {'w_q' int8 [K, N],
'w_scale' f32 [N]}; core.params.linear dispatches on the leaf names, so
every call site (DiT blocks, adapters, ...) picks the path up untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """[K, N] float -> per-output-channel symmetric int8."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": q, "w_scale": scale[0]}


def quantize_rows(x: jax.Array):
    """[..., K] float -> (int8 values, f32 per-row scales [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """y = dequant(int8(x) @ w_q) (+ b); returns x.dtype."""
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * p["w_scale"]
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_tree(params, min_size: int = 1 << 16):
    """Replace every large linear leaf {'w': ...} with its int8 form.

    Small layers (norm scales, biases, tiny projections) stay as-is — their
    cost is negligible and precision matters more there.
    """
    def walk(node):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "size") and node["w"].ndim >= 2 \
                    and node["w"].size >= min_size:
                q = {}
                w = node["w"]
                if w.ndim == 2:
                    q.update(quantize_weight(w))
                else:
                    # stacked layer axis: vmap the quantizer over axis 0
                    out = jax.vmap(quantize_weight)(w)
                    q["w_q"], q["w_scale"] = out["w_q"], out["w_scale"]
                for k, v in node.items():
                    if k != "w":
                        q[k] = v
                return q
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
