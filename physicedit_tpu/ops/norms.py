"""Normalisation and activation primitives (TPU dtype discipline).

Matches the numerics of the reference primitives:
- RMSNorm with fp32 variance (diffsynth/models/utils.py:241-257)
- LayerNorm without affine, eps=1e-6 (qwen_image_dit.py:337)
- ApproximateGELU x*sigmoid(1.702x) (qwen_image_dit.py:42-49)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, scale: jax.Array | None = None, eps: float = 1e-6) -> jax.Array:
    """RMS norm with variance computed in float32, matching the reference."""
    in_dtype = x.dtype
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x = (x * jax.lax.rsqrt(var + eps).astype(in_dtype)).astype(in_dtype)
    if scale is not None:
        x = x * scale
    return x


def layer_norm(x: jax.Array, eps: float = 1e-6,
               scale: jax.Array | None = None, bias: jax.Array | None = None) -> jax.Array:
    """LayerNorm (mean/var in fp32), affine optional."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.astype(in_dtype)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def approximate_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — the DiT MLP activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def l2_normalize_channel(x: jax.Array, axis: int, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize equivalent (used by the VAE RMS norm)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)
