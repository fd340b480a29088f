"""Attention primitives: XLA baseline + dispatch to the Pallas TPU kernel.

The DiT's hot loop is joint text+image self-attention over the concatenated
sequence (qwen_image_dit.py:304-311).  The reference uses FlashAttention-3 /
SDPA; here the baseline is a plain XLA dot-softmax-dot with fp32 accumulation,
and `physicedit_tpu.kernels.flash_attention` provides the fused Pallas path.

Layout: [B, S, N, D] ("BSND") everywhere — heads in the minor-most large dim,
which keeps QK^T and PV as large MXU matmuls after a single transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sdpa_bnsd(q: jax.Array, k: jax.Array, v: jax.Array,
              key_mask: jax.Array | None = None,
              bias: jax.Array | None = None) -> jax.Array:
    """Heads-major attention, fp32 softmax. q/k/v: [B, N, S, D] -> same.

    key_mask: optional [B, S_k] bool — False keys are excluded (padding).
    bias: optional [B, 1|N, S_q, S_k] additive bias (entity-mask attention).
    """
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if key_mask is not None:
        neg = jnp.asarray(-1e30, dtype=jnp.float32)
        logits = jnp.where(key_mask[:, None, None, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", probs, v)


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array,
             key_mask: jax.Array | None = None,
             bias: jax.Array | None = None) -> jax.Array:
    """Scaled dot-product attention over [B, S, N, D] inputs/outputs."""
    out = sdpa_bnsd(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), key_mask=key_mask, bias=bias)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("impl", "variant"))
def attention(q, k, v, key_mask=None, bias=None, impl: str = "xla",
              variant: str = "fixedmax"):
    """variant (pallas only): "fixedmax" assumes BOUNDED logits (true for
    the DiT, which RMS-norms q/k — kernels/flash_attention.py docstring);
    callers with unnormalised q/k whose logits can exceed ~70 nats must
    pass "online" (the running-max kernel), or CLAMP will flatten the
    softmax across extreme scores."""
    if impl == "xla":
        return sdpa_xla(q, k, v, key_mask=key_mask, bias=bias)
    if impl == "pallas":
        from physicedit_tpu.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, key_mask=key_mask, bias=bias,
                               variant=variant)
    raise ValueError(f"unknown attention impl: {impl}")


def default_impl() -> str:
    """Pick the fused kernel on TPU, the XLA fallback elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"
