"""Nexus-Gen projector modules, TPU-native (SURVEY M7).

Parity with diffsynth/models/nexus_gen_projector.py:

- ``NexusGenAdapter`` (:389-406): Linear -> LayerNorm -> ReLU -> Linear
  -> LayerNorm mapping LLM image embeddings (3584) to a generation
  decoder's conditioning width (4096).
- ``NexusGenImageEmbeddingMerger`` (:255-374): N full-attention (NOT
  causal — the vendored layer applies no mask, :131-178) Qwen2-style
  decoder layers over the predicted embeddings with M-RoPE positions
  rescaled to a 72x72 base grid (:336-356), followed by an RMS-normed
  projector MLP.

Both reuse the Qwen2.5-VL rebuild's primitives (rms_norm, M-RoPE tables
from models/qwen_vl.py — same rope_theta 1e6 and mrope sections).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.core.params import linear, linear_init
from physicedit_tpu.models import qwen_vl as VL
from physicedit_tpu.ops.norms import rms_norm

MERGER_CFG = VL.QWEN25_VL_7B_TEXT      # hidden 3584, 28 heads / 4 kv
BASE_GRID = (1, 72, 72)
SPATIAL_MERGE = 2
TOKENS_PER_SECOND = 2


# ---------------------------------------------------------------------------
# Adapter
# ---------------------------------------------------------------------------

def init_adapter_params(key, input_dim=3584, output_dim=4096, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, input_dim, output_dim, dtype),
        "ln1": {"w": jnp.ones((output_dim,), dtype),
                "b": jnp.zeros((output_dim,), dtype)},
        "fc2": linear_init(k2, output_dim, output_dim, dtype),
        "ln2": {"w": jnp.ones((output_dim,), dtype),
                "b": jnp.zeros((output_dim,), dtype)},
    }


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) / jnp.sqrt(var + eps)
    return (out * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


@jax.jit
def adapter_forward(params, x):
    """nexus_gen_projector.py:393-401."""
    x = _layer_norm(params["ln1"], linear(params["fc1"], x))
    x = jax.nn.relu(x)
    return _layer_norm(params["ln2"], linear(params["fc2"], x))


def adapter_from_torch(sd: dict, dtype=jnp.float32) -> dict:
    """Keys ``adapter.{0,1,3,4}.{weight,bias}`` (nn.Sequential indices;
    2 is the ReLU)."""
    from physicedit_tpu.io.convert import _lin, _t

    return {
        "fc1": _lin(sd, "adapter.0", dtype),
        "ln1": {"w": _t(sd, "adapter.1.weight", dtype),
                "b": _t(sd, "adapter.1.bias", dtype)},
        "fc2": _lin(sd, "adapter.3", dtype),
        "ln2": {"w": _t(sd, "adapter.4.weight", dtype),
                "b": _t(sd, "adapter.4.bias", dtype)},
    }


# ---------------------------------------------------------------------------
# Embedding merger
# ---------------------------------------------------------------------------

def init_merger_params(key, cfg: VL.QwenVLTextConfig = MERGER_CFG,
                       num_layers=1, out_channel=4096, expand_ratio=4,
                       dtype=jnp.float32):
    from physicedit_tpu.core.params import stack_trees

    d = cfg.hidden_size
    mid = out_channel * expand_ratio
    ks = iter(jax.random.split(key, 12 * num_layers + 4))

    def layer():
        kvd = cfg.num_kv_heads * cfg.head_dim
        return {
            "ln1": {"scale": jnp.ones((d,), dtype)},
            "q": linear_init(next(ks), d, d, dtype),
            "k": linear_init(next(ks), d, kvd, dtype),
            "v": linear_init(next(ks), d, kvd, dtype),
            "o": linear_init(next(ks), d, d, dtype, bias=False),
            "ln2": {"scale": jnp.ones((d,), dtype)},
            "mlp": {
                "gate": linear_init(next(ks), d, cfg.intermediate_size, dtype, bias=False),
                "up": linear_init(next(ks), d, cfg.intermediate_size, dtype, bias=False),
                "down": linear_init(next(ks), cfg.intermediate_size, d, dtype, bias=False),
            },
        }

    return {
        "layers": [layer() for _ in range(num_layers)],
        "proj": {
            "norm_in": {"scale": jnp.ones((d,), dtype)},
            "fc1": linear_init(next(ks), d, mid, dtype),
            "norm_mid": {"scale": jnp.ones((mid,), dtype)},
            "fc2": linear_init(next(ks), mid, out_channel, dtype),
            "norm_out": {"scale": jnp.ones((out_channel,), dtype)},
        },
    }


def merger_position_ids(grid, base_grid=BASE_GRID):
    """nexus_gen_projector.py:336-356: (t, h, w) M-RoPE indices over the
    embedding grid, H/W rescaled onto the 72x72 base grid (fractional
    positions — the reference keeps them float)."""
    t, h, w = grid
    gh, gw = h // SPATIAL_MERGE, w // SPATIAL_MERGE
    scale_h = base_grid[1] / h
    scale_w = base_grid[2] / w
    t_idx = np.repeat(np.arange(t) * TOKENS_PER_SECOND, gh * gw).astype(np.float32)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), t).astype(np.float32) * scale_h
    w_idx = np.tile(np.arange(gw), t * gh).astype(np.float32) * scale_w
    return np.stack([t_idx, h_idx, w_idx])[:, None, :]        # [3, 1, L]


def _merger_layer(p, cfg, x, cos, sin):
    """Full-attention Qwen2 layer (no causal mask; projector file :218-253)."""
    b, s, _ = x.shape
    n, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = rms_norm(x, p["ln1"]["scale"], cfg.eps)
    q = linear(p["q"], h).reshape(b, s, n, d)
    k = linear(p["k"], h).reshape(b, s, kvh, d)
    v = linear(p["v"], h).reshape(b, s, kvh, d)
    q = VL.apply_rope_half(q, cos, sin)
    k = VL.apply_rope_half(k, cos, sin)
    zero_bias = jnp.zeros((b, 1, s, s), jnp.float32)
    attn = VL._gqa_attention(q, k, v, zero_bias)
    x = x + linear(p["o"], attn)
    return x + VL._mlp(p["mlp"], rms_norm(x, p["ln2"]["scale"], cfg.eps))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _merger_core(params, cfg, x, position_ids):
    cos, sin = VL.mrope_cos_sin(position_ids, cfg)
    for p in params["layers"]:
        x = _merger_layer(p, cfg, x, cos, sin)
    pr = params["proj"]
    h = rms_norm(x, pr["norm_in"]["scale"], cfg.eps)
    h = linear(pr["fc1"], h)
    h = rms_norm(h, pr["norm_mid"]["scale"], cfg.eps)
    h = linear(pr["fc2"], jax.nn.silu(h))
    return rms_norm(h, pr["norm_out"]["scale"], cfg.eps)


def merger_forward(params, embeds, grid, ref_embeds=None, ref_grid=None,
                   cfg: VL.QwenVLTextConfig = MERGER_CFG):
    """nexus_gen_projector.py:357-371: optional reference-image embeddings
    are concatenated on the sequence axis with their own grid positions."""
    pos = merger_position_ids(grid)
    x = embeds
    if ref_embeds is not None:
        pos = np.concatenate([pos, merger_position_ids(ref_grid)], axis=-1)
        x = jnp.concatenate([embeds, ref_embeds], axis=1)
    return _merger_core(params, cfg, x, jnp.asarray(pos))


def merger_from_torch(sd: dict, cfg: VL.QwenVLTextConfig = MERGER_CFG,
                      dtype=jnp.float32) -> dict:
    """Keys ``layers.{i}.*`` + ``projector.{0,1,2,4,5}.*`` (Sequential:
    RMS, Linear, RMS, act, Linear, RMS); accepts the ``embedding_merger.``
    checkpoint prefix (converter at :377-386)."""
    from physicedit_tpu.io.convert import _lin, _t

    sd = {k[len("embedding_merger."):] if k.startswith("embedding_merger.")
          else k: v for k, v in sd.items()}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))

    def layer(i):
        p = f"layers.{i}"
        return {
            "ln1": {"scale": _t(sd, p + ".input_layernorm.weight", dtype)},
            "q": _lin(sd, p + ".self_attn.q_proj", dtype),
            "k": _lin(sd, p + ".self_attn.k_proj", dtype),
            "v": _lin(sd, p + ".self_attn.v_proj", dtype),
            "o": _lin(sd, p + ".self_attn.o_proj", dtype),
            "ln2": {"scale": _t(sd, p + ".post_attention_layernorm.weight", dtype)},
            "mlp": {
                "gate": _lin(sd, p + ".mlp.gate_proj", dtype),
                "up": _lin(sd, p + ".mlp.up_proj", dtype),
                "down": _lin(sd, p + ".mlp.down_proj", dtype),
            },
        }

    return {
        "layers": [layer(i) for i in range(n_layers)],
        "proj": {
            "norm_in": {"scale": _t(sd, "projector.0.weight", dtype)},
            "fc1": _lin(sd, "projector.1", dtype),
            "norm_mid": {"scale": _t(sd, "projector.2.weight", dtype)},
            "fc2": _lin(sd, "projector.4", dtype),
            "norm_out": {"scale": _t(sd, "projector.5.weight", dtype)},
        },
    }
