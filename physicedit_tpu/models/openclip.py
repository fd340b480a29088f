"""OpenCLIP (ViT-H/14-class) dual towers for HPSv2 / CLIPScore, TPU-native.

Rebuilds the network the reference's HPSv2 / HPSv2.1 / CLIP preference
scorers wrap through the vendored ``open_clip`` package
(diffsynth/extensions/ImageQualityMetric/hps.py:28-60, clip.py):

- vision: pre-LN ViT with class embedding, ln_pre, resblocks
  (x += attn(ln_1 x); x += mlp(ln_2 x)), ln_post on the CLS token, then a
  projection matrix,
- text: token + positional embeddings, CAUSALLY-masked resblocks,
  ln_final, pooled at the argmax token id (the EOT token has the highest
  id in the CLIP BPE vocab), then text_projection,
- score: cosine(image, text) — the reference returns the raw diagonal of
  normalised feature products (hps.py:74-83).

Weights load from the published open_clip state-dict key space
(``HPS_v2_compressed.safetensors``) via ``openclip_from_state_dict``.
Parity oracle in tests: HF ``transformers.CLIPModel`` (same math, HF key
space) — this environment ships no ``open_clip``.
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

# Vision-tower head counts by width (open_clip model registry values; the
# text tower is always width // 64).
_VISION_HEADS = {768: 12, 1024: 16, 1280: 16, 1408: 16, 1664: 16}


@dataclasses.dataclass(frozen=True)
class OpenClipTowerConfig:
    width: int
    layers: int
    heads: int
    patch_size: int = 14           # vision only
    context_length: int = 77       # text only
    quick_gelu: bool = False       # True only for original-OpenAI weights
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.width // self.heads


# ViT-H/14 (laion2B) — the tower under HPSv2/v2.1/PickScore/MPS.
VIT_H_14_VISION = OpenClipTowerConfig(width=1280, layers=32, heads=16)
VIT_H_14_TEXT = OpenClipTowerConfig(width=1024, layers=24, heads=16)


def _gelu(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _resblock(p, cfg: OpenClipTowerConfig, x, bias):
    b, s, d = x.shape
    n, hd = cfg.heads, cfg.head_dim
    h = layer_norm(x, cfg.eps, p["ln_1"]["scale"], p["ln_1"]["bias"])
    qkv = linear(p["qkv"], h).reshape(b, s, 3, n, hd)
    out = sdpa_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias=bias)
    x = x + linear(p["out"], out.reshape(b, s, d))
    h = layer_norm(x, cfg.eps, p["ln_2"]["scale"], p["ln_2"]["bias"])
    return x + linear(p["c_proj"], _gelu(linear(p["c_fc"], h),
                                         cfg.quick_gelu))


def _tower(params, cfg, x, bias=None):
    def body(carry, p):
        return _resblock(p, cfg, carry, bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_image_features(params, cfg: OpenClipTowerConfig, pixels):
    """CLIP-normalised pixels [B, H, W, 3] -> projected features [B, out].

    open_clip VisionTransformer.forward: conv1 (no bias) -> prepend class
    embedding -> +pos -> ln_pre -> resblocks -> ln_post(x[:, 0]) @ proj.
    """
    b = pixels.shape[0]
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixels, params["conv1"].astype(pixels.dtype), (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, -1, cfg.width)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)
    x = layer_norm(x, cfg.eps, params["ln_pre"]["scale"],
                   params["ln_pre"]["bias"])
    x = _tower(params, cfg, x)
    pooled = layer_norm(x[:, 0], cfg.eps, params["ln_post"]["scale"],
                        params["ln_post"]["bias"])
    return pooled @ params["proj"].astype(pooled.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_text_features(params, cfg: OpenClipTowerConfig, input_ids):
    """Token ids [B, S] -> projected features [B, out] (pooled at the
    argmax id — the EOT token, open_clip CLIP.encode_text)."""
    b, s = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["positional_embedding"][None, :s].astype(x.dtype)
    causal = jnp.where(
        jnp.tril(jnp.ones((s, s), bool)), 0.0, -jnp.inf
    )[None, None].astype(jnp.float32)
    x = _tower(params, cfg, x, bias=causal)
    x = layer_norm(x, cfg.eps, params["ln_final"]["scale"],
                   params["ln_final"]["bias"])
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return pooled @ params["text_projection"].astype(pooled.dtype)


def clip_similarity(params, vision_cfg, text_cfg, pixels, input_ids):
    """diag(normalize(img) @ normalize(txt).T) — the HPS/CLIP score
    (hps.py:74-83; no logit_scale, matching the reference)."""
    img = clip_image_features(params["visual"], vision_cfg, pixels)
    txt = clip_text_features(params["text"], text_cfg, input_ids)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.sum(img * txt, axis=-1)


# ---------------------------------------------------------------------------
# Weight conversion (open_clip state-dict key space)
# ---------------------------------------------------------------------------

def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _lin(sd, name, dtype):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _resblocks_from_torch(sd, prefix, dtype):
    n_layers = 1 + max(int(k[len(prefix):].split(".")[0])
                       for k in sd if k.startswith(prefix))

    def block(i):
        p = f"{prefix}{i}."
        return {
            "ln_1": _ln(sd, p + "ln_1", dtype),
            # nn.MultiheadAttention: fused in_proj [3W, W] + out_proj
            "qkv": {"w": jnp.asarray(
                        np.asarray(sd[p + "attn.in_proj_weight"]).T, dtype),
                    "b": jnp.asarray(sd[p + "attn.in_proj_bias"], dtype)},
            "out": _lin(sd, p + "attn.out_proj", dtype),
            "ln_2": _ln(sd, p + "ln_2", dtype),
            "c_fc": _lin(sd, p + "mlp.c_fc", dtype),
            "c_proj": _lin(sd, p + "mlp.c_proj", dtype),
        }

    return _stack([block(i) for i in range(n_layers)]), n_layers


def openclip_from_state_dict(sd, dtype=jnp.float32, quick_gelu=False,
                             vision_heads=None, text_heads=None):
    """open_clip CLIP state dict -> (params, vision_cfg, text_cfg).

    Configs are inferred from shapes; head counts come from the registry
    table (_VISION_HEADS / width//64) unless given.
    """
    g = lambda k: np.asarray(sd[k])
    v_width = g("visual.conv1.weight").shape[0]
    patch = g("visual.conv1.weight").shape[-1]
    v_blocks, v_layers = _resblocks_from_torch(
        sd, "visual.transformer.resblocks.", dtype)
    t_width = g("token_embedding.weight").shape[1]
    t_blocks, t_layers = _resblocks_from_torch(sd, "transformer.resblocks.",
                                               dtype)
    vision_cfg = OpenClipTowerConfig(
        width=v_width, layers=v_layers,
        heads=(vision_heads if vision_heads is not None
               else _VISION_HEADS.get(v_width, max(1, v_width // 64))),
        patch_size=patch, quick_gelu=quick_gelu)
    text_cfg = OpenClipTowerConfig(
        width=t_width, layers=t_layers,
        heads=(text_heads if text_heads is not None
               else max(1, t_width // 64)),
        context_length=g("positional_embedding").shape[0],
        quick_gelu=quick_gelu)
    params = {
        "visual": {
            "conv1": jnp.asarray(
                g("visual.conv1.weight").transpose(2, 3, 1, 0), dtype),
            "class_embedding": jnp.asarray(g("visual.class_embedding"),
                                           dtype),
            "positional_embedding": jnp.asarray(
                g("visual.positional_embedding"), dtype),
            "ln_pre": _ln(sd, "visual.ln_pre", dtype),
            "blocks": v_blocks,
            "ln_post": _ln(sd, "visual.ln_post", dtype),
            "proj": jnp.asarray(g("visual.proj"), dtype),
        },
        "text": {
            "token_embedding": jnp.asarray(g("token_embedding.weight"),
                                           dtype),
            "positional_embedding": jnp.asarray(g("positional_embedding"),
                                                dtype),
            "blocks": t_blocks,
            "ln_final": _ln(sd, "ln_final", dtype),
            "text_projection": jnp.asarray(g("text_projection"), dtype),
        },
    }
    return params, vision_cfg, text_cfg


# CLIP preprocessing constants (same normalisation as BLIP).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip(pil_image, size=224):
    """Resize(shorter->size, bicubic) + CenterCrop + normalise ->
    [1, size, size, 3] float32 (open_clip image_transform eval chain)."""
    im = pil_image.convert("RGB")
    w, h = im.size
    scale = size / min(w, h)
    im = im.resize((max(size, int(round(w * scale))),
                    max(size, int(round(h * scale)))), resample=3)
    w, h = im.size
    left, top = (w - size) // 2, (h - size) // 2
    im = im.crop((left, top, left + size, top + size))
    x = np.asarray(im, np.float32) / 255.0
    return ((x - CLIP_MEAN) / CLIP_STD)[None]
