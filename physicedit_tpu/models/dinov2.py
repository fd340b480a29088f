"""DINOv2-with-registers vision encoder, TPU-native.

Rebuilds the reference's Dinov2withNorm wrapper
(diffsynth/pipelines/dinov2.py:8-35): HF Dinov2WithRegistersModel with the
final layernorm's affine stripped (normalise-only) and the first 5 tokens
(1 CLS + 4 registers) dropped from the output.

Architecture (ViT-B/14 + registers): patch embed 14x14 conv, CLS token,
learned absolute pos-emb (bicubically interpolated to the input grid),
4 register tokens inserted after the CLS token *after* pos-emb addition,
pre-norm transformer blocks with LayerScale, final LN (no affine here).

The transformer layers are stacked and scanned (same pattern as the DiT).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops.norms import layer_norm
from physicedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 14
    num_register_tokens: int = 4
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def num_unused_tokens(self):
        # 1 CLS + registers, dropped by the PhysicEdit wrapper (dinov2.py:30).
        return 1 + self.num_register_tokens


DINOV2_BASE = DinoV2Config()


def interpolate_pos_embed(pos_emb: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Bicubic interpolation of the patch position embeddings.

    pos_emb: [1, 1 + N0, D] (CLS first).  Returns [1, 1 + grid_h*grid_w, D].
    """
    n0 = pos_emb.shape[1] - 1
    g0 = int(round(float(np.sqrt(n0))))
    if g0 * g0 == n0 and (grid_h, grid_w) == (g0, g0):
        return pos_emb
    cls_pos, patch_pos = pos_emb[:, :1], pos_emb[:, 1:]
    patch_pos = patch_pos.reshape(1, g0, g0, -1).astype(jnp.float32)
    patch_pos = jax.image.resize(
        patch_pos, (1, grid_h, grid_w, patch_pos.shape[-1]), method="bicubic")
    patch_pos = patch_pos.reshape(1, grid_h * grid_w, -1).astype(pos_emb.dtype)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def _layer_forward(p, cfg: DinoV2Config, x):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    h = layer_norm(x, cfg.eps, p["norm1"]["scale"], p["norm1"]["bias"])
    qkv = linear(p["qkv"], h).reshape(b, s, 3, n, hd)
    out = sdpa_xla(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    out = linear(p["out"], out.reshape(b, s, d))
    x = x + out * p["ls1"]
    h = layer_norm(x, cfg.eps, p["norm2"]["scale"], p["norm2"]["bias"])
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))
    return x + h * p["ls2"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def dinov2_features(params, cfg: DinoV2Config, pixels: jax.Array) -> jax.Array:
    """ImageNet-normalised pixels [B, H, W, 3] -> patch features [B, N, D].

    Output matches Dinov2withNorm.forward: final LN without affine, CLS and
    register tokens removed.
    """
    b, h, w, _ = pixels.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size

    x = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["w"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = (x + params["patch_embed"]["b"].astype(pixels.dtype)).reshape(b, gh * gw, -1)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params["pos_emb"], gh, gw).astype(x.dtype)
    regs = jnp.broadcast_to(params["register_tokens"].astype(x.dtype),
                            (b,) + params["register_tokens"].shape[1:])
    x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    def body(carry, layer_params):
        return _layer_forward(layer_params, cfg, carry), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, cfg.eps)  # normalise-only (affine stripped)
    return x[:, cfg.num_unused_tokens:]


# ImageNet normalisation used for DINO inputs (qwen_image_physical.py:201-204).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_dino(images_01: jax.Array) -> jax.Array:
    """[B, H, W, 3] in [0, 1] -> ImageNet-normalised."""
    return (images_01 - IMAGENET_MEAN) / IMAGENET_STD
