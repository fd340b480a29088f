"""Qwen-Image (Wan-style) VAE, TPU-native image mode.

Rebuilds diffsynth/models/qwen_image_vae.py:640-729 for the image (T=1)
path the PhysicEdit pipeline actually uses.

TPU-first design decision: in image mode the reference's causal 3D conv
machinery degenerates exactly —
- a causal Conv3d pads 2 zero frames in front (qwen_image_vae.py:40), so a
  T=1 input only ever meets the *last* temporal tap of each kernel; the op
  is a 2D convolution with weight[:, :, -1],
- the temporal halves of downsample3d/upsample3d run only when a feature
  cache is supplied (qwen_image_vae.py:259,289) — never for images.
So this VAE is a pure NHWC 2D conv network; the io converter slices the
temporal tap out of 3D checkpoints at load time.  (Video mode with the
streaming cache is a documented non-goal of the image pipeline; the
reference itself never exercises it for PhysicEdit.)

Architecture (qwen_image_vae.py:344-448,522-636): base_dim 96,
dim_mult [1,2,4,4], 2 res blocks/stage, single-head spatial attention in the
mid block, z_dim 16 with fixed per-channel normalisation
(qwen_image_vae.py:667-704), 8x spatial down/up sampling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.ops.norms import l2_normalize_channel


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2

    @property
    def enc_dims(self):
        return [self.base_dim * u for u in (1,) + tuple(self.dim_mult)]

    @property
    def dec_dims(self):
        m = tuple(self.dim_mult)
        return [self.base_dim * u for u in (m[-1],) + m[::-1]]


QWEN_VAE_CONFIG = VAEConfig()

# Fixed latent normalisation (qwen_image_vae.py:667-704).
LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], dtype=np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], dtype=np.float32)


# ---------------------------------------------------------------------------
# Primitive ops (NHWC)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DN)
    return out + p["b"].astype(x.dtype)


def channel_rms(p, x):
    """QwenImageRMS_norm (qwen_image_vae.py:54-77): per-position channel L2
    normalisation scaled by sqrt(C) and a learned gamma."""
    c = x.shape[-1]
    return l2_normalize_channel(x, axis=-1) * (c ** 0.5) * p["gamma"].astype(x.dtype)


def _res_block(p, x):
    h = conv2d(p["shortcut"], x) if "shortcut" in p else x
    x = jax.nn.silu(channel_rms(p["norm1"], x))
    x = conv2d(p["conv1"], x)
    x = jax.nn.silu(channel_rms(p["norm2"], x))
    x = conv2d(p["conv2"], x)
    return x + h


def _attn_block(p, x):
    """Single-head spatial self-attention (qwen_image_vae.py:156-198)."""
    b, h, w, c = x.shape
    identity = x
    xn = channel_rms(p["norm"], x)
    qkv = conv2d(p["to_qkv"], xn)  # 1x1 conv -> [B, H, W, 3C]
    qkv = qkv.reshape(b, h * w, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) / (c ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
    return conv2d(p["proj"], out) + identity


def _downsample(p, x):
    """ZeroPad2d(right+bottom) + stride-2 conv (qwen_image_vae.py:249)."""
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (2, 2), [(0, 1), (0, 1)],
        dimension_numbers=_DN) + p["b"].astype(x.dtype)


def _upsample(p, x):
    """nearest-exact 2x + 3x3 conv halving channels (qwen_image_vae.py:239)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p, x)


def _mid_block(p, x):
    x = _res_block(p["res0"], x)
    x = _attn_block(p["attn"], x)
    return _res_block(p["res1"], x)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def encoder_forward(p, cfg: VAEConfig, x):
    """[B, H, W, 3] in [-1, 1] -> [B, H/8, W/8, 2*z_dim] (pre-quant)."""
    x = conv2d(p["conv_in"], x)
    for stage in p["stages"]:
        for res in stage["res"]:
            x = _res_block(res, x)
        if "down" in stage:
            x = _downsample(stage["down"], x)
    x = _mid_block(p["mid"], x)
    x = jax.nn.silu(channel_rms(p["norm_out"], x))
    return conv2d(p["conv_out"], x)


def decoder_forward(p, cfg: VAEConfig, x):
    """[B, h, w, z_dim] (post-quant) -> [B, 8h, 8w, 3]."""
    x = conv2d(p["conv_in"], x)
    x = _mid_block(p["mid"], x)
    for stage in p["stages"]:
        for res in stage["res"]:
            x = _res_block(res, x)
        if "up" in stage:
            x = _upsample(stage["up"], x)
    x = jax.nn.silu(channel_rms(p["norm_out"], x))
    return conv2d(p["conv_out"], x)


def encode(params, x, cfg: VAEConfig = QWEN_VAE_CONFIG):
    """Image [B, H, W, 3] in [-1, 1] -> normalised latent [B, H/8, W/8, 16].

    Mirrors QwenImageVAE.encode (qwen_image_vae.py:706-717): encoder ->
    quant_conv -> keep the 16 mean channels -> fixed per-channel whitening.
    """
    z = encoder_forward(params["encoder"], cfg, x)
    z = conv2d(params["quant_conv"], z)[..., : cfg.z_dim]
    mean = jnp.asarray(LATENT_MEAN, x.dtype)
    std = jnp.asarray(LATENT_STD, x.dtype)
    return (z - mean) / std


def decode(params, z, cfg: VAEConfig = QWEN_VAE_CONFIG):
    """Normalised latent -> image [B, H, W, 3] (approximately [-1, 1])."""
    mean = jnp.asarray(LATENT_MEAN, z.dtype)
    std = jnp.asarray(LATENT_STD, z.dtype)
    z = z * std + mean
    z = conv2d(params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], cfg, z)


encode_jit = jax.jit(encode, static_argnames=("cfg",))
decode_jit = jax.jit(decode, static_argnames=("cfg",))
