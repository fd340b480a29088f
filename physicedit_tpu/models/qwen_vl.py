"""Qwen2.5-VL-7B conditioning encoder / physical-reasoning generator, TPU-native.

Rebuilds the model behind the reference's QwenImageTextEncoderWithDecode
(diffsynth/models/qwen_image_text_encoder_withdecode.py:6-146 — an HF
Qwen2_5_VLForConditionalGeneration subclass) as functional JAX modules:

- text decoder: 28 layers, hidden 3584, 28 Q / 4 KV heads (GQA), SwiGLU MLP
  18944, RMSNorm, M-RoPE with sections [16, 24, 24] over (t, h, w) position
  ids, rope_theta 1e6, vocab 152064,
- vision tower (models/qwen_vl_vision.py): 32-layer ViT with windowed
  attention and a 2x2 spatial-merge projector to 3584,
- `edit_forward` equivalent: last-layer hidden states for prompt encoding
  (qwen_image_physical.py:769,795),
- greedy KV-cache decoding for the inference-time physical reasoner
  (qwen_image_physical.py:859-864).

Layers are stacked and scanned; the KV cache is a preallocated ring-free
[L, B, S_max, KV, D] buffer updated with dynamic_update_slice — XLA-friendly
static shapes throughout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    intermediate_size: int = 18944
    vocab_size: int = 152064
    rope_theta: float = 1e6
    mrope_section: tuple = (16, 24, 24)
    eps: float = 1e-6
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    eos_token_id: int = 151645


QWEN25_VL_7B_TEXT = QwenVLTextConfig()

TINY_TEXT = QwenVLTextConfig(
    hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    intermediate_size=128, vocab_size=512)


# ---------------------------------------------------------------------------
# M-RoPE
# ---------------------------------------------------------------------------

def mrope_cos_sin(position_ids: jax.Array, cfg: QwenVLTextConfig):
    """position_ids: [3, B, S] (t, h, w) -> cos, sin [B, S, head_dim].

    Section-merged per HF apply_multimodal_rotary_pos_emb: frequency dims
    [0:16) take t positions, [16:40) h, [40:64) w; the second half of the
    head dim duplicates the first (emb = cat(freqs, freqs)).
    """
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    inv_freq = jnp.asarray(inv_freq, jnp.float32)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [3, B, S, half]

    sections = np.cumsum([0] + list(cfg.mrope_section))
    parts = [freqs[i, ..., sections[i]:sections[i + 1]] for i in range(3)]
    merged = jnp.concatenate(parts, axis=-1)  # [B, S, half]
    emb = jnp.concatenate([merged, merged], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF rotate-half RoPE. x: [B, S, N, D]; cos/sin: [B, S, D]."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * c + rot * s


# ---------------------------------------------------------------------------
# Decoder layers
# ---------------------------------------------------------------------------

import os as _os

# Pallas GQA causal flash kernel for prefill / prompt encoding (kill switch
# for debugging; decode and non-TPU backends use the dense path regardless).
_VL_FLASH = _os.environ.get("PHYSICEDIT_VL_FLASH", "1") != "0"


def _gqa_attention(q, k, v, mask_bias):
    """q: [B, S, N, D]; k/v: [B, T, KV, D]; mask_bias: [B, 1, S, T] additive.

    Grouped einsum — K/V are NEVER repeated to N heads (the jnp.repeat of
    the round-2 version materialised a [B, T, N, D] copy of the cache every
    layer, which made the weight-read-bound decode cache-copy-bound
    instead: 28 layers x ~1.5 GB of HBM traffic per token at B=8).  Head
    h reads KV head h // (N/KV), matching HF's repeat_interleave layout.
    """
    b, s, n, d = q.shape
    kv = k.shape[2]
    g = n // kv
    qg = q.reshape(b, s, kv, g, d)
    logits = jnp.einsum("bskgd,btkd->bkgst", qg, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    logits = logits + mask_bias[:, None]          # [B, 1, 1, S, T]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(b, s, n * d)


def _prefill_attention(q, k, v, mask_bias, key_mask):
    """Full-sequence causal attention (prefill / prompt encoding).

    Routes to the Pallas GQA flash kernel (kernels/flash_attention.py:
    grouped K/V reads, in-kernel causal mask, above-diagonal block skip)
    when the shapes fit the TPU kernel; falls back to the dense XLA path
    (which materialises a [B, N, S, S] fp32 logits tensor — the round-2
    prefill bottleneck) otherwise.  key_mask: [B, S] bool or None.
    """
    s, d = q.shape[1], q.shape[-1]
    use_flash = (_VL_FLASH and key_mask is not None and s > 1
                 and d == 128 and q.shape[2] % k.shape[2] == 0
                 and jax.devices()[0].platform == "tpu")
    if use_flash:
        from physicedit_tpu.kernels.flash_attention import gqa_causal_flash

        return gqa_causal_flash(q, k, v, key_mask)
    return _gqa_attention(q, k, v, mask_bias)


def _mlp(p, x):
    if "gate_up" in p:
        gu = linear(p["gate_up"], x)
        g, u = jnp.split(gu, 2, axis=-1)
        return linear(p["down"], jax.nn.silu(g) * u)
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


def fuse_decode_projections(params: dict) -> dict:
    """Concatenate q/k/v -> 'qkv' and gate/up -> 'gate_up' along the output
    axis: one GEMM launch + one activation row-quantize where there were
    three (the weight-read-bound decode is launch-latency sensitive; at
    M=1 every saved dispatch and amax pass is pure win).

    Exact math: per-output-channel weight scales concatenate unchanged, so
    float AND packed-int4 ({'w4','w_scale'}) leaves fuse bitwise-identically.
    _layer/_mlp dispatch on the fused keys, so unfused trees keep working
    (HF parity tests, sharded multi-chip specs)."""

    def cat(leaves):
        # the output-channel axis is always the LAST one, for w [.., K, N],
        # w4 [.., K/2, N], w_scale [.., N] and b [.., N] alike (stacked-layer
        # leaves carry a leading L axis)
        return {key: jnp.concatenate([l[key] for l in leaves], axis=-1)
                for key in leaves[0]}

    def fix_layer(lp):
        lp = dict(lp)
        if "q" in lp and all(set(lp[k]) == set(lp["q"]) for k in ("k", "v")):
            lp["qkv"] = cat([lp.pop("q"), lp.pop("k"), lp.pop("v")])
        mlp = dict(lp["mlp"])
        if "gate" in mlp and set(mlp["gate"]) == set(mlp["up"]):
            mlp["gate_up"] = cat([mlp.pop("gate"), mlp.pop("up")])
        lp["mlp"] = mlp
        return lp

    params = dict(params)
    if isinstance(params["layers"], (list, tuple)):   # split_layers layout
        params["layers"] = tuple(fix_layer(lp) for lp in params["layers"])
    else:
        params["layers"] = fix_layer(params["layers"])
    return params


def split_layers(params: dict) -> dict:
    """Convert the stacked ``params["layers"]`` tree ([L, ...] leaves, the
    lax.scan layout) into a TUPLE of per-layer trees.

    Why: the per-layer weight slice a layer scan consumes must MATERIALISE
    before the Pallas W4 GEMV kernels can read it (Pallas operands are
    whole buffers — the xs slice cannot fuse), costing an extra write+read
    of the full 3.26 GB weight stream per decode token (~2.2 ms/token
    measured at B=8, tools/proto_decode_unroll.py: 12.83 -> 10.65).  With
    per-layer trees, text_forward/prefill/greedy_decode unroll the layer
    loop in Python and the kernels read each layer's buffer in place.

    Same total bytes (the stacked buffers are freed once the caller drops
    its reference); compile time grows with the unrolled body and is
    amortised by the persistent compilation cache.
    """
    stacked = params.get("layers")
    if isinstance(stacked, (list, tuple)):
        return params
    lead = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = dict(params)
    out["layers"] = tuple(
        jax.tree_util.tree_map(lambda a, i=i: a[i], stacked)
        for i in range(lead))
    return out


def _layer_seq(params):
    """Iterate layers for both layouts: a tuple of per-layer trees
    (split_layers) or None for the stacked lax.scan layout."""
    ls = params["layers"]
    return ls if isinstance(ls, (list, tuple)) else None


def _qkv_proj(p, cfg: QwenVLTextConfig, h, b, s):
    """Project hidden states to q/k/v heads (fused or separate weights)."""
    n, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in p:  # fused projection (fuse_decode_projections)
        qkv = linear(p["qkv"], h)
        q_w, kv_w = n * d, kvh * d
        q = qkv[..., :q_w].reshape(b, s, n, d)
        k = qkv[..., q_w:q_w + kv_w].reshape(b, s, kvh, d)
        v = qkv[..., q_w + kv_w:].reshape(b, s, kvh, d)
    else:
        q = linear(p["q"], h).reshape(b, s, n, d)
        k = linear(p["k"], h).reshape(b, s, kvh, d)
        v = linear(p["v"], h).reshape(b, s, kvh, d)
    return q, k, v


def _layer(p, cfg: QwenVLTextConfig, x, cos, sin, mask_bias, kv_cache=None,
           cache_pos=None, key_mask=None):
    """One decoder layer.  With kv_cache=(k_buf, v_buf) [B, S_max, KV, D] and
    cache_pos (scalar), runs incrementally and returns the updated cache.
    key_mask: optional [B, S] bool enabling the Pallas causal-flash path for
    full-sequence (prefill) calls."""
    b, s, _ = x.shape

    h = rms_norm(x, p["ln1"]["scale"], cfg.eps)
    q, k, v = _qkv_proj(p, cfg, h, b, s)
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)

    if kv_cache is not None:
        k_buf, v_buf = kv_cache
        k_buf = jax.lax.dynamic_update_slice(k_buf, k.astype(k_buf.dtype), (0, cache_pos, 0, 0))
        v_buf = jax.lax.dynamic_update_slice(v_buf, v.astype(v_buf.dtype), (0, cache_pos, 0, 0))
        new_cache = (k_buf, v_buf)
        if s > 1 and mask_bias.shape[-1] == s:
            # prefill with an S-local bias: queries cover every live
            # position, so attending over the padded cache tail would only
            # score masked zeros (~40% of the logits at the reasoner
            # shapes) — attend over the fresh k/v instead
            k_all, v_all = k, v
        else:
            k_all, v_all = k_buf, v_buf
    else:
        k_all, v_all = k, v
        new_cache = None

    if k_all.shape[1] == s and s > 1:
        attn = _prefill_attention(q, k_all.astype(q.dtype),
                                  v_all.astype(q.dtype), mask_bias, key_mask)
    else:
        attn = _gqa_attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                              mask_bias)
    x = x + linear(p["o"], attn)
    x = x + _mlp(p["mlp"], rms_norm(x, p["ln2"]["scale"], cfg.eps))
    return x, new_cache


def _causal_bias(attn_mask: jax.Array, s_q: int, dtype=jnp.float32):
    """[B, T] padding mask -> additive [B, 1, S_q, T] causal+padding bias.
    Assumes queries are the last s_q positions of the T-length sequence."""
    b, t = attn_mask.shape
    q_pos = jnp.arange(t - s_q, t)[:, None]
    k_pos = jnp.arange(t)[None, :]
    causal = k_pos <= q_pos
    ok = causal[None] & attn_mask[:, None, :].astype(bool)
    return jnp.where(ok, 0.0, -1e30)[:, None].astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def text_forward(params, cfg: QwenVLTextConfig, inputs_embeds, position_ids,
                 attn_mask):
    """Full-sequence forward -> last-layer hidden states [B, S, D].

    inputs_embeds: [B, S, D] (token embeddings with vision features already
    scattered in); position_ids: [3, B, S]; attn_mask: [B, S] bool.
    """
    cos, sin = mrope_cos_sin(position_ids, cfg)
    bias = _causal_bias(attn_mask, inputs_embeds.shape[1])
    key_mask = attn_mask.astype(bool)

    layers = _layer_seq(params)
    if layers is not None:       # split_layers layout: unrolled, no xs copy
        x = inputs_embeds
        for lp in layers:
            x, _ = _layer(lp, cfg, x, cos, sin, bias, key_mask=key_mask)
    else:
        def body(x, layer_params):
            x, _ = _layer(layer_params, cfg, x, cos, sin, bias,
                          key_mask=key_mask)
            return x, None

        x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return rms_norm(x, params["norm"]["scale"], cfg.eps)


def init_text_params(key, cfg: QwenVLTextConfig, dtype=jnp.float32):
    """Random text-decoder params (tests/benches); same tree layout as
    io/convert.qwen_vl_text_from_torch.  Qwen2.5 bias placement: q/k/v
    biased, o / mlp / lm_head bias-free."""
    from physicedit_tpu.core.params import linear_init, stack_trees

    d, kvd = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim
    qd = cfg.num_heads * cfg.head_dim
    ks = iter(jax.random.split(key, 10 * cfg.num_layers + 4))

    def layer():
        return {
            "ln1": {"scale": jnp.ones((d,), dtype)},
            "q": linear_init(next(ks), d, qd, dtype),
            "k": linear_init(next(ks), d, kvd, dtype),
            "v": linear_init(next(ks), d, kvd, dtype),
            "o": linear_init(next(ks), qd, d, dtype, bias=False),
            "ln2": {"scale": jnp.ones((d,), dtype)},
            "mlp": {
                "gate": linear_init(next(ks), d, cfg.intermediate_size, dtype, bias=False),
                "up": linear_init(next(ks), d, cfg.intermediate_size, dtype, bias=False),
                "down": linear_init(next(ks), cfg.intermediate_size, d, dtype, bias=False),
            },
        }

    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, d), jnp.float32)
        .astype(dtype) * 0.02,
        "layers": stack_trees([layer() for _ in range(cfg.num_layers)]),
        "norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": linear_init(next(ks), d, cfg.vocab_size, dtype, bias=False),
    }


def quantize_embedding_int8(params: dict) -> dict:
    """Per-row int8 quantization of the token embedding table.

    The [152k, 3584] bf16 table is 1.09 GB of the VL stack's residency;
    int8 halves it at per-row scales (embeddings tolerate 8-bit easily —
    max relative row error ~0.4%).  embed_tokens dequantizes on gather.
    """
    e = params["embed"]
    if isinstance(e, dict):
        return params
    ef = jnp.asarray(e, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(ef), axis=1), 1e-8)
    e8 = jnp.round(ef / amax[:, None] * 127.0).astype(jnp.int8)
    return dict(params, embed={"e8": e8,
                               "e_scale": (amax / 127.0).astype(jnp.bfloat16)})


def embed_tokens(params, input_ids):
    e = params["embed"]
    if isinstance(e, dict):  # int8-quantized table (quantize_embedding_int8)
        rows = e["e8"][input_ids].astype(jnp.float32) \
            * e["e_scale"][input_ids].astype(jnp.float32)[..., None]
        return rows.astype(e["e_scale"].dtype)
    return e[input_ids]


def lm_logits(params, hidden):
    return linear(params["lm_head"], hidden)


def _gqa_attention_decode(q, kc, vc, k_new, v_new, bias_cache,
                          k_scale=None, v_scale=None):
    """Single-token GQA attention over (cache, fresh-token) WITHOUT
    writing the token into the cache first: two-part softmax.

    q [B, 1, N, D]; kc/vc [B, S, KV, D] (the layer's cache, read straight
    from scan xs so XLA can fuse the slice into the dot — materialising
    the slice cost ~4.5 ms/token at B=8); k_new/v_new [B, 1, KV, D];
    bias_cache [B, 1, 1, S] additive (-1e30 for not-yet-written or padded
    slots).  The fresh token is always valid (causal self-attention).

    k_scale/v_scale [B, S, KV]: per-(position, head) int8-cache scales —
    applied to the logits (k) and folded into the probabilities before
    the PV dot (v), so no dequantized cache copy is ever materialised.
    """
    b, _, n, d = q.shape
    kv = kc.shape[2]
    g = n // kv
    qg = q.reshape(b, 1, kv, g, d)
    lc = jnp.einsum("bskgd,btkd->bkgst", qg, kc,
                    preferred_element_type=jnp.float32) / (d ** 0.5)
    if k_scale is not None:
        # [B, S, KV] -> [B, KV, 1, 1, S]
        lc = lc * k_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None]
    lc = lc + bias_cache[:, None]                   # [B, KV, G, 1, S]
    ln = jnp.einsum("bskgd,btkd->bkgst", qg, k_new,
                    preferred_element_type=jnp.float32) / (d ** 0.5)
    m = jnp.maximum(jnp.max(lc, axis=-1), ln[..., 0])        # [B, KV, G, 1]
    pc = jnp.exp(lc - m[..., None])
    pn = jnp.exp(ln - m[..., None])                          # [B, KV, G, 1, 1]
    den = jnp.sum(pc, axis=-1) + pn[..., 0]                  # [B, KV, G, 1]
    if v_scale is not None:
        pc = pc * v_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None]
    oc = jnp.einsum("bkgst,btkd->bskgd", pc.astype(jnp.bfloat16), vc)
    on = pn.transpose(0, 3, 1, 2, 4) * v_new[:, :, :, None]  # [B,1,KV,G,D]
    out = (oc.astype(jnp.float32) + on.astype(jnp.float32)) \
        / den.transpose(0, 3, 1, 2)[..., None]
    return out.reshape(b, 1, n * d).astype(q.dtype)


def _decode_layer_xs(p, cfg: QwenVLTextConfig, x, cos, sin, bias_cache,
                     kc, vc):
    """One decode layer reading this layer's cache from scan xs; returns
    (x, k_new, v_new) — the caller writes the new-token slab for ALL
    layers with one dynamic_update_slice after the layer scan.

    int8 caches are handled WITHOUT materialising a dequantized copy:
    the int8->bf16 convert fuses into the attention dots and the
    per-(position, head) scales apply to the [.., S]-sized logits
    (k side) / fold into the probabilities before the PV dot (v side) —
    exact, since the scale is constant along the head dim.
    """
    b = x.shape[0]
    h = rms_norm(x, p["ln1"]["scale"], cfg.eps)
    q, k, v = _qkv_proj(p, cfg, h, b, 1)
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    if isinstance(kc, tuple):
        attn = _gqa_attention_decode(q, kc[0].astype(q.dtype),
                                     vc[0].astype(q.dtype), k, v,
                                     bias_cache, k_scale=kc[1],
                                     v_scale=vc[1])
    else:
        attn = _gqa_attention_decode(q, kc.astype(q.dtype),
                                     vc.astype(q.dtype), k, v, bias_cache)
    x = x + linear(p["o"], attn)
    x = x + _mlp(p["mlp"], rms_norm(x, p["ln2"]["scale"], cfg.eps))
    return x, k, v


# ---------------------------------------------------------------------------
# Greedy KV-cache decoding (the inference-time physical reasoner)
# ---------------------------------------------------------------------------

def _kv_quantize(kv):
    """[.., KV, D] -> (int8 [.., KV, D], per-(pos, head) scale [.., KV])."""
    a = jnp.maximum(jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1), 1e-8)
    q = jnp.round(kv.astype(jnp.float32) / a[..., None] * 127.0
                  ).astype(jnp.int8)
    return q, (a / 127.0).astype(jnp.bfloat16)


def _kv_dequantize(q, s, dtype):
    return (q.astype(jnp.float32)
            * s.astype(jnp.float32)[..., None]).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "max_total_len",
                                             "kv_int8"))
def prefill(params, cfg: QwenVLTextConfig, inputs_embeds, position_ids,
            attn_mask, max_total_len: int, kv_int8: bool = False):
    """Run the prompt, build the KV cache padded to max_total_len.

    Returns (last_token_logits [B, V], kv_caches, last_hidden [B, S, D]).
    kv_caches is (k, v) each [L, B, S_max, KV, D], or with kv_int8 the
    4-tuple (k8, k_scale, v8, v_scale) — int8 per-(position, head) scaled
    entries, halving the per-item cache residency in sweep serving (each
    reasoner row's bf16 cache is ~145 MB at the 1536+1000 layout; the
    batch size is HBM-bound, docs/SERVING.md).
    """
    b, s, _ = inputs_embeds.shape
    cos, sin = mrope_cos_sin(position_ids, cfg)
    # S-local causal+padding bias: the padded cache tail holds only zeros
    # the mask would discard, so prefill attention stays on the live keys
    # (_layer's s>1 local path)
    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    ok = (k_pos <= q_pos)[None] & attn_mask.astype(bool)[:, None, :]
    bias = jnp.where(ok, 0.0, -1e30)[:, None].astype(jnp.float32)

    kvh, d = cfg.num_kv_heads, cfg.head_dim

    def body(x, layer_params):
        k_buf = jnp.zeros((b, max_total_len, kvh, d), inputs_embeds.dtype)
        v_buf = jnp.zeros((b, max_total_len, kvh, d), inputs_embeds.dtype)
        x, (k_buf, v_buf) = _layer(layer_params, cfg, x, cos, sin, bias,
                                   kv_cache=(k_buf, v_buf), cache_pos=0,
                                   key_mask=attn_mask.astype(bool))
        if kv_int8:
            k8, ks = _kv_quantize(k_buf)
            v8, vs = _kv_quantize(v_buf)
            return x, (k8, ks, v8, vs)
        return x, (k_buf, v_buf)

    layers = _layer_seq(params)
    if layers is not None:       # split_layers layout: unrolled, no xs copy
        x, parts = inputs_embeds, []
        for lp in layers:
            x, c = body(x, lp)
            parts.append(c)
        caches = tuple(jnp.stack([c[i] for c in parts])
                       for i in range(len(parts[0])))
    else:
        x, caches = jax.lax.scan(body, inputs_embeds, params["layers"])
    hidden = rms_norm(x, params["norm"]["scale"], cfg.eps)
    logits = lm_logits(params, hidden[:, -1])
    return logits, caches, hidden


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_decode(params, cfg: QwenVLTextConfig, caches, first_token,
                  start_pos, start_rope_pos, max_new_tokens: int,
                  key_mask=None):
    """Greedy decode loop (scan + done flag; static shapes throughout).

    caches: [L]-stacked (k_buf, v_buf) from prefill.
    first_token: [B] first sampled token (argmax of the prefill logits).
    start_pos: scalar int cache-write position (= padded prompt length).
    start_rope_pos: [B] rope position of the first new token (text rope: all
    three components equal).
    key_mask: optional [B, S_max] bool marking VALID prompt cache entries —
    required when the prompt was (left-)padded to a bucketed length so the
    decode program is reused across prompt lengths; padded slots stay
    masked, generated slots become valid as they are written.
    Returns tokens [B, max_new_tokens] (eos-padded after stop) and done mask.

    Decodes with ``lax.while_loop`` and exits as soon as every row has
    emitted EOS — the same cost model as the reference's HF ``generate``
    (qwen_image_physical.py:860 stops at EOS), instead of always paying for
    max_new_tokens steps.  Output is bit-identical to the full-length scan
    (post-EOS slots are EOS-filled).
    """
    b = first_token.shape[0]
    if len(caches) == 4:   # int8 cache (prefill kv_int8=True)
        k8, ks, v8, vs = caches
        kbuf0, vbuf0 = (k8, ks), (v8, vs)
        lead = k8
    else:                  # [L, B, S_max, KV, D] each (prefill scan ys)
        kbuf0, vbuf0 = caches
        lead = kbuf0
    s_max = lead.shape[2]
    num_layers = lead.shape[0]

    int8_cache = isinstance(kbuf0, tuple)

    def step(carry, _):
        tok, pos, rope_pos, kbuf, vbuf, done = carry
        x = embed_tokens(params, tok)[:, None, :]  # [B, 1, D]
        pids = jnp.broadcast_to(rope_pos[None, :, None], (3, b, 1))
        cos, sin = mrope_cos_sin(pids, cfg)

        k_pos = jnp.arange(s_max)[None, :]
        ok = k_pos < pos   # strictly-written cache slots; the fresh token
        #                    is handled by the two-part decode attention
        if key_mask is not None:
            # padded prompt slots stay invalid; generated slots (>= start
            # of decoding, i.e. >= the prompt's padded length) follow the
            # causal rule only
            ok = ok & (key_mask | (k_pos >= start_pos))
        bias = jnp.where(ok, 0.0, -1e30)[:, None, None, :].astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (b, 1, 1, s_max))

        # Weights AND caches ride the layer loop sliced per layer; each
        # layer emits only its new-token K/V, and ONE dynamic_update_slice
        # per token writes the [L, B, 1, KV, D] slab into the while-carried
        # buffers.  With split_layers params the loop is Python-unrolled:
        # the scan-xs weight slice would have to MATERIALISE before the
        # Pallas W4 GEMV kernels (an extra write+read of the whole 3.26 GB
        # weight stream per token, ~2.2 ms at B=8 — proto_decode_unroll).
        # Cache reads stay stacked either way: static/xs slices feeding
        # XLA einsums fuse without copies.
        layers = _layer_seq(params)
        if int8_cache:
            k8, ks = kbuf
            v8, vs = vbuf

            if layers is not None:
                kns, vns = [], []
                for i, lp in enumerate(layers):
                    x, k_new, v_new = _decode_layer_xs(
                        lp, cfg, x, cos, sin, bias,
                        (k8[i], ks[i]), (v8[i], vs[i]))
                    kns.append(k_new)
                    vns.append(v_new)
                k_stack = jnp.stack(kns)
                v_stack = jnp.stack(vns)
            else:
                def layer_body(x, inp):  # noqa: F811 — int8 variant
                    lp, kc8, kcs, vc8, vcs = inp
                    x, k_new, v_new = _decode_layer_xs(
                        lp, cfg, x, cos, sin, bias, (kc8, kcs), (vc8, vcs))
                    return x, (k_new, v_new)

                x, (k_stack, v_stack) = jax.lax.scan(
                    layer_body, x, (params["layers"], k8, ks, v8, vs))
            kq, kqs = _kv_quantize(k_stack)
            vq, vqs = _kv_quantize(v_stack)
            kbuf = (jax.lax.dynamic_update_slice(k8, kq, (0, 0, pos, 0, 0)),
                    jax.lax.dynamic_update_slice(ks, kqs, (0, 0, pos, 0)))
            vbuf = (jax.lax.dynamic_update_slice(v8, vq, (0, 0, pos, 0, 0)),
                    jax.lax.dynamic_update_slice(vs, vqs, (0, 0, pos, 0)))
        else:
            if layers is not None:
                kns, vns = [], []
                for i, lp in enumerate(layers):
                    x, k_new, v_new = _decode_layer_xs(
                        lp, cfg, x, cos, sin, bias, kbuf[i], vbuf[i])
                    kns.append(k_new)
                    vns.append(v_new)
                k_stack = jnp.stack(kns)
                v_stack = jnp.stack(vns)
            else:
                def layer_body(x, inp):  # noqa: F811 — bf16 variant
                    lp, kc, vc = inp
                    x, k_new, v_new = _decode_layer_xs(lp, cfg, x, cos, sin,
                                                       bias, kc, vc)
                    return x, (k_new, v_new)

                x, (k_stack, v_stack) = jax.lax.scan(
                    layer_body, x, (params["layers"], kbuf, vbuf))
            kbuf = jax.lax.dynamic_update_slice(
                kbuf, k_stack.astype(kbuf.dtype), (0, 0, pos, 0, 0))
            vbuf = jax.lax.dynamic_update_slice(
                vbuf, v_stack.astype(vbuf.dtype), (0, 0, pos, 0, 0))

        hidden = rms_norm(x, params["norm"]["scale"], cfg.eps)
        logits = lm_logits(params, hidden[:, -1])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt, pos + 1, rope_pos + 1, kbuf, vbuf, done), tok

    done0 = first_token == cfg.eos_token_id
    buf0 = jnp.full((b, max_new_tokens), cfg.eos_token_id, jnp.int32)

    def cond(state):
        i, carry, _ = state
        return (i < max_new_tokens) & ~jnp.all(carry[5])

    def body(state):
        i, carry, buf = state
        buf = jax.lax.dynamic_update_slice(buf, carry[0][:, None], (0, i))
        carry, _ = step(carry, None)
        return i + 1, carry, buf

    _, (_, _, _, _, _, done), toks = jax.lax.while_loop(
        cond, body,
        (0, (first_token, start_pos, start_rope_pos, kbuf0, vbuf0, done0),
         buf0))
    return toks, done
