"""BLIP towers for the ImageReward preference scorer, TPU-native.

Rebuilds the two networks ImageReward's score path uses (reference
diffsynth/extensions/ImageQualityMetric/imagereward.py:125-148 +
BLIP/blip_pretrain.py:33-38):

- a timm-style pre-LN ViT (``vit='large'``: width 1024, depth 24, heads 16,
  patch 16, LN eps 1e-6, final LayerNorm) producing the FULL token sequence
  (CLS + patches) as cross-attention memory (BLIP/vit.py),
- the "med" BERT text encoder (BLIP/med.py — the post-LN bert-base with a
  cross-attention sub-layer in every block, run in 'multimodal' mode):
  bi-directional self-attention over the 35-token prompt, cross-attention
  into the image tokens, GELU FFN; the CLS feature feeds ImageReward's
  5-linear MLP head (no activations — imagereward.py:24-52).

Functional JAX pytrees like every model here; weights come from the
published ``ImageReward.safetensors`` key space via
``imagereward_from_state_dict``.  Parity oracle in tests: the HF
``transformers`` BLIP port (BlipVisionModel / BlipTextModel), which is the
same med.py lineage.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops.attention import sdpa_xla
from physicedit_tpu.ops.norms import layer_norm


# ---------------------------------------------------------------------------
# Vision tower (BLIP/vit.py — timm pre-LN ViT)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.width // self.num_heads


BLIP_VIT_LARGE = BlipViTConfig()


def _vit_block(p, cfg: BlipViTConfig, x):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    h = layer_norm(x, cfg.eps, p["norm1"]["scale"], p["norm1"]["bias"])
    qkv = linear(p["qkv"], h).reshape(b, s, 3, n, hd)
    out = sdpa_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    x = x + linear(p["proj"], out.reshape(b, s, d))
    h = layer_norm(x, cfg.eps, p["norm2"]["scale"], p["norm2"]["bias"])
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg",))
def blip_vit_forward(params, cfg: BlipViTConfig, pixels: jax.Array):
    """CLIP-normalised pixels [B, H, W, 3] -> tokens [B, 1+P, width].

    The full sequence (CLS first), final-LayerNormed — what
    ``blip.visual_encoder(image)`` returns as cross-attention memory.
    """
    b, h, w, _ = pixels.shape
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["w"].astype(pixels.dtype),
        (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = (x + params["patch_embed"]["b"].astype(x.dtype)
         ).reshape(b, (h // ps) * (w // ps), -1)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    def body(carry, p):
        return _vit_block(p, cfg, carry), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(x, cfg.eps, params["norm"]["scale"],
                      params["norm"]["bias"])


# ---------------------------------------------------------------------------
# Text tower (BLIP/med.py — post-LN BERT with per-layer cross-attention)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524          # bert-base + [DEC]/[ENC]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    encoder_width: int = 1024        # cross-attention K/V input (ViT width)
    eps: float = 1e-12

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


BLIP_MED_BASE = BlipTextConfig()


def _bert_attention(q_p, k_p, v_p, o_p, ln_p, cfg, hidden, kv_src, bias):
    """One (self- or cross-) attention sub-layer with BERT post-LN."""
    b, s, _ = hidden.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = linear(q_p, hidden).reshape(b, s, n, hd)
    k = linear(k_p, kv_src).reshape(b, kv_src.shape[1], n, hd)
    v = linear(v_p, kv_src).reshape(b, kv_src.shape[1], n, hd)
    out = sdpa_xla(q, k, v, bias=bias)
    out = linear(o_p, out.reshape(b, s, -1))
    return layer_norm(out + hidden, cfg.eps, ln_p["scale"], ln_p["bias"])


def _mask_bias(mask, dtype):
    """[B, S_k] 1/0 mask -> additive bias [B, 1, 1, S_k] (med.py semantics:
    (1 - mask) * -10000 added to the attention scores)."""
    if mask is None:
        return None
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0
            )[:, None, None, :].astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def blip_text_forward(params, cfg: BlipTextConfig, input_ids,
                      attention_mask, encoder_states, encoder_mask=None):
    """'multimodal' text encoder (med.py BertModel, add_pooling_layer=False).

    input_ids: [B, S] int32; attention_mask: [B, S] (1 = live);
    encoder_states: [B, S_img, encoder_width] image tokens.
    Returns last_hidden_state [B, S, hidden].
    """
    b, s = input_ids.shape
    emb = jnp.take(params["word_embeddings"], input_ids, axis=0)
    emb = emb + params["position_embeddings"][None, :s]
    x = layer_norm(emb, cfg.eps, params["emb_ln"]["scale"],
                   params["emb_ln"]["bias"])
    self_bias = _mask_bias(attention_mask, x.dtype)
    cross_bias = _mask_bias(encoder_mask, x.dtype)

    def body(carry, p):
        x = carry
        x = _bert_attention(p["self"]["q"], p["self"]["k"], p["self"]["v"],
                            p["self"]["out"], p["self"]["ln"], cfg,
                            x, x, self_bias)
        x = _bert_attention(p["cross"]["q"], p["cross"]["k"], p["cross"]["v"],
                            p["cross"]["out"], p["cross"]["ln"], cfg,
                            x, encoder_states, cross_bias)
        h = jax.nn.gelu(linear(p["ffn"]["fc1"], x), approximate=False)
        x = layer_norm(linear(p["ffn"]["fc2"], h) + x, cfg.eps,
                       p["ffn"]["ln"]["scale"], p["ffn"]["ln"]["bias"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


# ---------------------------------------------------------------------------
# ImageReward head + end-to-end score
# ---------------------------------------------------------------------------

# Score normalisation constants (imagereward.py:64-65).
IMAGEREWARD_MEAN = 0.16717362830052426
IMAGEREWARD_STD = 1.0333394966054072


def imagereward_score(params, vit_cfg: BlipViTConfig, txt_cfg: BlipTextConfig,
                      pixels, input_ids, attention_mask):
    """The full reward: BLIP ViT -> med cross-encoder -> CLS -> MLP ->
    (r - mean) / std  (imagereward.py:125-148)."""
    image_embeds = blip_vit_forward(params["vit"], vit_cfg, pixels)
    hidden = blip_text_forward(params["text"], txt_cfg, input_ids,
                               attention_mask, image_embeds)
    x = hidden[:, 0, :].astype(jnp.float32)
    for lp in params["mlp"]:
        x = linear(lp, x)
    return (x[:, 0] - IMAGEREWARD_MEAN) / IMAGEREWARD_STD


# ---------------------------------------------------------------------------
# Weight conversion (ImageReward.safetensors key space)
# ---------------------------------------------------------------------------

def _lin(sd, name, dtype):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def blip_vit_from_torch(sd, prefix="", dtype=jnp.float32, num_heads=None):
    """timm-ViT key space (BLIP/vit.py): blocks.N.attn.qkv etc."""
    g = lambda k: np.asarray(sd[prefix + k])
    depth = 1 + max(int(k[len(prefix) + 7:].split(".")[0])
                    for k in sd if k.startswith(prefix + "blocks."))
    width = g("cls_token").shape[-1]
    n_patches = g("pos_embed").shape[1] - 1
    patch = g("patch_embed.proj.weight").shape[-1]
    heads = (num_heads if num_heads is not None
             else {768: 12, 1024: 16}.get(width, max(1, width // 64)))
    cfg = BlipViTConfig(
        image_size=int(round(float(np.sqrt(n_patches)))) * patch,
        patch_size=patch, width=width, depth=depth, num_heads=heads,
        mlp_ratio=g("blocks.0.mlp.fc1.weight").shape[0] // width)

    def block(i):
        p = f"{prefix}blocks.{i}."
        return {
            "norm1": _ln(sd, p + "norm1", dtype),
            "qkv": _lin(sd, p + "attn.qkv", dtype),
            "proj": _lin(sd, p + "attn.proj", dtype),
            "norm2": _ln(sd, p + "norm2", dtype),
            "fc1": _lin(sd, p + "mlp.fc1", dtype),
            "fc2": _lin(sd, p + "mlp.fc2", dtype),
        }

    params = {
        "cls_token": jnp.asarray(g("cls_token"), dtype),
        "pos_embed": jnp.asarray(g("pos_embed"), dtype),
        # torch conv [W, 3, ph, pw] -> HWIO
        "patch_embed": {
            "w": jnp.asarray(g("patch_embed.proj.weight")
                             .transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(g("patch_embed.proj.bias"), dtype),
        },
        "blocks": _stack([block(i) for i in range(depth)]),
        "norm": _ln(sd, prefix + "norm", dtype),
    }
    return params, cfg


def blip_text_from_torch(sd, prefix="", encoder_width=None,
                         dtype=jnp.float32, num_heads=None):
    """med-BERT key space: encoder.layer.N.{attention,crossattention,...}."""
    g = lambda k: np.asarray(sd[prefix + k])
    n_layers = 1 + max(int(k[len(prefix) + 14:].split(".")[0])
                       for k in sd if k.startswith(prefix + "encoder.layer."))
    hidden = g("embeddings.word_embeddings.weight").shape[1]
    inter = g("encoder.layer.0.intermediate.dense.weight").shape[0]
    enc_w = (encoder_width if encoder_width is not None
             else g("encoder.layer.0.crossattention.self.key.weight").shape[1])
    cfg = BlipTextConfig(
        vocab_size=g("embeddings.word_embeddings.weight").shape[0],
        hidden_size=hidden,
        num_layers=n_layers,
        num_heads=(num_heads if num_heads is not None
                   else {768: 12}.get(hidden, max(1, hidden // 64))),
        intermediate_size=inter,
        max_position=g("embeddings.position_embeddings.weight").shape[0],
        encoder_width=enc_w)

    def attn(p):
        return {"q": _lin(sd, p + "self.query", dtype),
                "k": _lin(sd, p + "self.key", dtype),
                "v": _lin(sd, p + "self.value", dtype),
                "out": _lin(sd, p + "output.dense", dtype),
                "ln": _ln(sd, p + "output.LayerNorm", dtype)}

    def layer(i):
        p = f"{prefix}encoder.layer.{i}."
        return {
            "self": attn(p + "attention."),
            "cross": attn(p + "crossattention."),
            "ffn": {"fc1": _lin(sd, p + "intermediate.dense", dtype),
                    "fc2": _lin(sd, p + "output.dense", dtype),
                    "ln": _ln(sd, p + "output.LayerNorm", dtype)},
        }

    params = {
        "word_embeddings": jnp.asarray(
            g("embeddings.word_embeddings.weight"), dtype),
        "position_embeddings": jnp.asarray(
            g("embeddings.position_embeddings.weight"), dtype),
        "emb_ln": _ln(sd, prefix + "embeddings.LayerNorm", dtype),
        "layers": _stack([layer(i) for i in range(n_layers)]),
    }
    return params, cfg


def imagereward_from_state_dict(sd, dtype=jnp.float32):
    """Published ImageReward.safetensors -> {vit, text, mlp} + configs.

    MLP head Sequential indices {0, 2, 4, 6, 7} (imagereward.py:28-41 —
    dropout slots in between, activations commented out upstream)."""
    vit_params, vit_cfg = blip_vit_from_torch(
        sd, prefix="blip.visual_encoder.", dtype=dtype)
    txt_params, txt_cfg = blip_text_from_torch(
        sd, prefix="blip.text_encoder.", encoder_width=vit_cfg.width,
        dtype=dtype)
    idxs = sorted(int(k.split(".")[2]) for k in sd
                  if k.startswith("mlp.layers.") and k.endswith(".weight"))
    mlp = tuple(_lin(sd, f"mlp.layers.{i}", jnp.float32) for i in idxs)
    return ({"vit": vit_params, "text": txt_params, "mlp": mlp},
            vit_cfg, txt_cfg)


# CLIP-style normalisation for BLIP inputs (imagereward.py:16-22).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_blip(pil_image, size=224):
    """Resize(shorter->size, bicubic) + CenterCrop(size) + normalise ->
    [1, size, size, 3] float32 (the torchvision chain at imagereward.py:
    15-22, PIL/numpy only)."""
    im = pil_image.convert("RGB")
    w, h = im.size
    scale = size / min(w, h)
    im = im.resize((max(size, int(round(w * scale))),
                    max(size, int(round(h * scale)))), resample=3)  # BICUBIC
    w, h = im.size
    left, top = (w - size) // 2, (h - size) // 2
    im = im.crop((left, top, left + size, top + size))
    x = np.asarray(im, np.float32) / 255.0
    return ((x - CLIP_MEAN) / CLIP_STD)[None]
