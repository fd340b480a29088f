"""Qwen-Image (Wan-style) VAE, video mode: causal 3D convolutions over T.

Completes M2 (SURVEY.md section 2.2): the reference QwenImageVAE accepts
5D video input (qwen_image_vae.py:706-729 unsqueezes images to T=1 and
passes video through unchanged).  Behavioural fact worth pinning: the
reference's temporal down/up-sampling (`time_conv` inside
QwenImageResample) runs ONLY when a streaming feature cache is supplied
(qwen_image_vae.py:259-300), and `QwenImageVAE.encode`/`decode` never
supply one — so the reference's video path is exactly "causal 3D convs
over the full clip, per-frame spatial resampling, no temporal
compression".  This module reproduces that path; the streaming-cache
chunked mode is dead code upstream and a documented non-goal.

Layout: NTHWC.  Spatial-only ops (attention, up/down-sampling, 1x1x1
convs) fold T into the batch and reuse the image-mode kernels from
models/vae.py; only the kT=3 causal convolutions are genuinely 3D.
Weights come from io/convert.vae_video_from_torch (full temporal kernels;
the image-mode converter slices the last temporal tap instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physicedit_tpu.models.vae import (
    LATENT_MEAN, LATENT_STD, QWEN_VAE_CONFIG, VAEConfig, _attn_block,
    _downsample, _upsample, channel_rms, conv2d,
)

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def causal_conv3d(p, x):
    """Causal 3D conv: (kT-1) zero frames padded in FRONT of time
    (qwen_image_vae.py:40-50), spatial SAME."""
    w = p["w"].astype(x.dtype)
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    pads = [(kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(x, w, (1, 1, 1), pads,
                                       dimension_numbers=_DN3)
    return out + p["b"].astype(x.dtype)


def _per_frame(fn, p, x, *args):
    """Fold T into batch and apply an image-mode op."""
    b, t = x.shape[0], x.shape[1]
    y = fn(p, x.reshape((b * t,) + x.shape[2:]), *args)
    return y.reshape((b, t) + y.shape[1:])


def _res_block3d(p, x):
    h = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    x = jax.nn.silu(channel_rms(p["norm1"], x))
    x = causal_conv3d(p["conv1"], x)
    x = jax.nn.silu(channel_rms(p["norm2"], x))
    x = causal_conv3d(p["conv2"], x)
    return x + h


def _mid_block3d(p, x):
    x = _res_block3d(p["res0"], x)
    x = _per_frame(_attn_block, p["attn"], x)
    return _res_block3d(p["res1"], x)


def encoder_forward(p, cfg: VAEConfig, x):
    """[B, T, H, W, 3] -> [B, T, H/8, W/8, 2*z_dim] (pre-quant)."""
    x = causal_conv3d(p["conv_in"], x)
    for stage in p["stages"]:
        for res in stage["res"]:
            x = _res_block3d(res, x)
        if "down" in stage:
            x = _per_frame(_downsample, stage["down"], x)
    x = _mid_block3d(p["mid"], x)
    x = jax.nn.silu(channel_rms(p["norm_out"], x))
    return causal_conv3d(p["conv_out"], x)


def decoder_forward(p, cfg: VAEConfig, x):
    x = causal_conv3d(p["conv_in"], x)
    x = _mid_block3d(p["mid"], x)
    for stage in p["stages"]:
        for res in stage["res"]:
            x = _res_block3d(res, x)
        if "up" in stage:
            x = _per_frame(_upsample, stage["up"], x)
    x = jax.nn.silu(channel_rms(p["norm_out"], x))
    return causal_conv3d(p["conv_out"], x)


def encode(params, x, cfg: VAEConfig = QWEN_VAE_CONFIG):
    """Video [B, T, H, W, 3] in [-1, 1] -> latents [B, T, H/8, W/8, 16]."""
    z = encoder_forward(params["encoder"], cfg, x)
    z = _per_frame(conv2d, params["quant_conv"], z)[..., : cfg.z_dim]
    mean = jnp.asarray(LATENT_MEAN, x.dtype)
    std = jnp.asarray(LATENT_STD, x.dtype)
    return (z - mean) / std


def decode(params, z, cfg: VAEConfig = QWEN_VAE_CONFIG):
    """Latents [B, T, h, w, 16] -> video [B, T, H, W, 3]."""
    mean = jnp.asarray(LATENT_MEAN, z.dtype)
    std = jnp.asarray(LATENT_STD, z.dtype)
    z = z * std + mean
    z = _per_frame(conv2d, params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], cfg, z)


encode_jit = jax.jit(encode, static_argnames=("cfg",))
decode_jit = jax.jit(decode, static_argnames=("cfg",))
