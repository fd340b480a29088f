"""Train-time dual visual-prior extractor (the PhysicalVisualEmbedder).

Rebuilds QwenImageUnit_PhysicalVisualEmbedder
(qwen_image_physical.py:992-1120): the pseudo targets that supervise the
VisualThinkingDualAdapter come from feature *deltas* between a video's
middle key frames and its first (source) frame:

DINO branch: frames -> resize(1.5x224) + random-crop 224 + ImageNet norm
  -> DINOv2 -> + frame-index embedding -> flatten frames -> Perceiver(768)
  -> adapter(768->3584); delta vs the same path on the source image.
VAE branch: frames -> VAE encode -> 2x2 patchify (dim 64) -> + frame-index
  embedding -> flatten -> Perceiver(64) -> adapter(64->3584); delta vs
  source.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.models import dinov2 as m_dino
from physicedit_tpu.models import vae as m_vae
from physicedit_tpu.models.adapters import perceiver_resampler, visual_thinking_adapter
from physicedit_tpu.ops.patchify import patchify

DINO_INPUT_SIZE = 224


def dino_preprocess(frames, rng: np.random.Generator,
                    size: int = DINO_INPUT_SIZE) -> np.ndarray:
    """PIL frames -> [F, size, size, 3] ImageNet-normalised.

    Mirrors dino_input_preprocess (qwen_image_physical.py:1042-1054):
    bicubic resize with the SHORT side to 1.5*size, random crop, normalise.
    The random crop is train-time augmentation; `rng` makes it seedable.
    """
    from PIL import Image

    first = int(size * 1.5)
    out = []
    for im in frames:
        w, h = im.size
        if w <= h:
            nw, nh = first, max(first, round(first * h / w))
        else:
            nh, nw = first, max(first, round(first * w / h))
        im = im.convert("RGB").resize((nw, nh), Image.BICUBIC)
        x0 = int(rng.integers(0, nw - size + 1))
        y0 = int(rng.integers(0, nh - size + 1))
        arr = np.asarray(im.crop((x0, y0, x0 + size, y0 + size)), np.float32) / 255.0
        arr = (arr - m_dino.IMAGENET_MEAN) / m_dino.IMAGENET_STD
        out.append(arr)
    return np.stack(out)


def _branch(resampler_p, adapter_p, tokens: jax.Array) -> jax.Array:
    """[1, N, dim] tokens -> [1, 64, 3584] via resampler + adapter."""
    return visual_thinking_adapter(adapter_p, perceiver_resampler(resampler_p, tokens))


def compute_visual_priors(
    adapters: dict,
    dinov2_params, dinov2_cfg,
    vae_params, vae_cfg,
    middle_key_frames, source_image,
    rng: np.random.Generator,
    dtype=jnp.float32,
):
    """Returns (pseudo_special_emb_dino, pseudo_special_emb_vae), each
    [1, 64, 3584] — the adapter's training targets."""
    f = len(middle_key_frames)

    # ---- DINO branch (qwen_image_physical.py:1068-1088) ----
    mid = jnp.asarray(dino_preprocess(middle_key_frames, rng), dtype)
    feats = m_dino.dinov2_features(dinov2_params, dinov2_cfg, mid)  # [F, N, 768]
    t_emb = adapters["dino_time_embed"][jnp.arange(f)]
    feats = feats + t_emb[:, None, :].astype(feats.dtype)
    mid_tokens = feats.reshape(1, -1, feats.shape[-1])
    mid_emb = _branch(adapters["dino_resampler"],
                      adapters["dino_resampler_adapter"], mid_tokens)

    src = jnp.asarray(dino_preprocess([source_image], rng), dtype)
    src_feats = m_dino.dinov2_features(dinov2_params, dinov2_cfg, src)
    src_tokens = src_feats.reshape(1, -1, src_feats.shape[-1])
    src_emb = _branch(adapters["dino_resampler"],
                      adapters["dino_resampler_adapter"], src_tokens)
    pseudo_dino = mid_emb - src_emb

    # ---- VAE branch (qwen_image_physical.py:1090-1117) ----
    def vae_tokens(images):
        arrs = [np.asarray(im.convert("RGB"), np.float32) / 127.5 - 1.0
                for im in images]
        lat = m_vae.encode_jit(vae_params, jnp.asarray(np.stack(arrs), dtype),
                               vae_cfg)
        return patchify(lat)  # [F, S, 64]

    mid_lat = vae_tokens(middle_key_frames)
    t_emb = adapters["vae_time_embed"][jnp.arange(f)]
    mid_lat = mid_lat + t_emb[:, None, :].astype(mid_lat.dtype)
    mid_emb_v = _branch(adapters["vae_resampler"],
                        adapters["vae_resampler_adapter"],
                        mid_lat.reshape(1, -1, mid_lat.shape[-1]))

    src_lat = vae_tokens([source_image])
    src_emb_v = _branch(adapters["vae_resampler"],
                        adapters["vae_resampler_adapter"],
                        src_lat.reshape(1, -1, src_lat.shape[-1]))
    return pseudo_dino, mid_emb_v - src_emb_v
