"""PhysicEdit adapter stack: PerceiverResampler + VisualThinking heads.

Rebuilds diffsynth/pipelines/helpers.py as functional JAX modules:
- PerceiverResampler (helpers.py:67-110): learned latents cross-attend to
  media tokens (+ themselves), learned absolute pos-emb, depth-2, final LN.
- VisualThinkingAdapter (helpers.py:112-121): Linear-GELU-Linear projector.
- VisualThinkingDualAdapter (helpers.py:123-183): timestep-mixed dual head
  alpha(t)*head_dino(x) + (1-alpha)*head_vae(x), with the alpha-weighted
  MSE training loss.

These carry the "latent transition prior": at every denoise step the 64
special-token embeddings are rewritten by the dual adapter
(qwen_image_physical.py:1333-1336).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physicedit_tpu.core.params import linear, linear_init
from physicedit_tpu.ops.norms import layer_norm

SPECIAL_TOKEN_NUM = 64


# ---------------------------------------------------------------------------
# PerceiverResampler
# ---------------------------------------------------------------------------

def _ln(p, x):
    return layer_norm(x, eps=1e-5, scale=p["scale"], bias=p["bias"])


def perceiver_attention(p, x, latents, heads: int = 8, dim_head: int = 64,
                        media_mask=None):
    """Cross-attention: latents query (media + latents) (helpers.py:21-65).

    media_mask: optional [B, N] bool — False media tokens are excluded
    from the keys (zero-padded frames in fixed-shape training batches;
    the reference never pads, torch shapes are dynamic)."""
    b, m, _ = latents.shape
    xn = _ln(p["norm_media"], x)
    ln = _ln(p["norm_latents"], latents)

    q = linear(p["to_q"], ln)
    kv_input = jnp.concatenate([xn, ln], axis=1)
    kv = linear(p["to_kv"], kv_input)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t):
        return t.reshape(t.shape[0], t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k,
                        preferred_element_type=jnp.float32) * (dim_head ** -0.5)
    if media_mask is not None:
        full = jnp.concatenate(
            [media_mask, jnp.ones((b, m), bool)], axis=1)  # latents valid
        logits = jnp.where(full[:, None, None, :], logits, -1e30)
    logits = logits - jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, m, heads * dim_head)
    return linear(p["to_out"], out)


def perceiver_ff(p, x):
    """LN -> Linear(4x) -> exact GELU -> Linear (helpers.py:8-19)."""
    x = _ln(p["norm"], x)
    x = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    return linear(p["fc2"], x)


def perceiver_resampler(p, x, heads: int = 8, dim_head: int = 64,
                        media_mask=None):
    """x: [B, N, dim] media tokens -> [B, num_latents, dim].

    media_mask: optional [B, N] bool key-validity mask (see
    perceiver_attention)."""
    b, n, _ = x.shape
    latents = jnp.broadcast_to(p["latents"], (b,) + p["latents"].shape)
    x = x + p["pos_emb"][:n][None, :, :].astype(x.dtype)
    for layer in p["layers"]:
        latents = latents + perceiver_attention(layer["attn"], x, latents,
                                                heads, dim_head, media_mask)
        latents = latents + perceiver_ff(layer["ff"], latents)
    return _ln(p["norm"], latents)


def init_perceiver_params(key, dim: int, depth: int = 2, dim_head: int = 64,
                          heads: int = 8, num_latents: int = SPECIAL_TOKEN_NUM,
                          max_num_media_tokens: int = 4096, dtype=jnp.float32):
    inner = dim_head * heads
    ks = iter(jax.random.split(key, 4 + depth * 5))

    def ln_p():
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    layers = []
    for _ in range(depth):
        layers.append({
            "attn": {
                "norm_media": ln_p(),
                "norm_latents": ln_p(),
                "to_q": linear_init(next(ks), dim, inner, dtype, bias=False),
                "to_kv": linear_init(next(ks), dim, inner * 2, dtype, bias=False),
                "to_out": linear_init(next(ks), inner, dim, dtype, bias=False),
            },
            "ff": {
                "norm": ln_p(),
                "fc1": linear_init(next(ks), dim, dim * 4, dtype),
                "fc2": linear_init(next(ks), dim * 4, dim, dtype),
            },
        })
    return {
        "latents": (jax.random.normal(next(ks), (num_latents, dim)) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(next(ks), (max_num_media_tokens, dim))).astype(dtype),
        "layers": layers,
        "norm": ln_p(),
    }


# ---------------------------------------------------------------------------
# VisualThinking adapters
# ---------------------------------------------------------------------------

def visual_thinking_adapter(p, x):
    """Linear(out*3) -> exact GELU -> Linear (helpers.py:112-121)."""
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=False))


def init_visual_thinking_params(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, out_dim * 3, dtype),
        "fc2": linear_init(k2, out_dim * 3, out_dim, dtype),
    }


def dual_adapter_alpha(timestep, t_min: float, t_max: float):
    """alpha(t) = clip((t - t_min) / (t_max - t_min + 1e-6), 0, 1)."""
    a = (timestep.astype(jnp.float32) - t_min) / (t_max - t_min + 1e-6)
    return jnp.clip(a, 0.0, 1.0)


def dual_adapter_forward(p, x, timestep, t_min: float, t_max: float):
    """Returns (mixed, pred_dino, pred_vae) (helpers.py:152-164).

    x: [B, S, D]; timestep: [B] in training-timestep units (0..1000).
    """
    pred_dino = visual_thinking_adapter(p["head_dino"], x)
    pred_vae = visual_thinking_adapter(p["head_vae"], x)
    alpha = dual_adapter_alpha(timestep, t_min, t_max)[:, None, None].astype(pred_dino.dtype)
    return alpha * pred_dino + (1 - alpha) * pred_vae, pred_dino, pred_vae


def dual_adapter_loss(pred_dino, pred_vae, gt_dino, gt_vae, timestep,
                      t_min: float, t_max: float, epsilon: float = 0.1):
    """Alpha-weighted dual MSE (helpers.py:166-183)."""
    alpha = dual_adapter_alpha(timestep, t_min, t_max)
    loss_dino = jnp.mean(jnp.square(pred_dino.astype(jnp.float32)
                                    - gt_dino.astype(jnp.float32)), axis=(1, 2))
    loss_vae = jnp.mean(jnp.square(pred_vae.astype(jnp.float32)
                                   - gt_vae.astype(jnp.float32)), axis=(1, 2))
    w = alpha.reshape(-1)
    w_dino = w + epsilon
    w_vae = (1 - w) + epsilon
    total = w_dino + w_vae
    return jnp.mean((w_dino / total) * loss_dino + (w_vae / total) * loss_vae)


def init_dual_adapter_params(key, in_dim: int = 3584, out_dim: int = 3584,
                             dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "head_dino": init_visual_thinking_params(k1, in_dim, out_dim, dtype),
        "head_vae": init_visual_thinking_params(k2, in_dim, out_dim, dtype),
    }
