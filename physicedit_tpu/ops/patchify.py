"""Latent patchify/unpatchify (2x2 pixel-shuffle of the 16-ch VAE latent).

Equivalent to the reference einops patterns
  "B C (H P) (W Q) -> B (H W) (C P Q)"  and inverse, with P=Q=2
(qwen_image_physical.py:1344,1402) but expressed over NHWC latents, the
TPU-friendly layout this framework uses for all image tensors.
"""

from __future__ import annotations

import jax


def patchify(latents_nhwc: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, (H/2 * W/2), C*4] with channel-major token layout.

    Token feature order matches the reference's (C P Q): feature index
    c*4 + p*2 + q.
    """
    b, h, w, c = latents_nhwc.shape
    x = latents_nhwc.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> [B, H/2, W/2, C, P, Q]
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpatchify(tokens: jax.Array, height: int, width: int) -> jax.Array:
    """Inverse of patchify: [B, S, C*4] -> [B, H, W, C] (H=height//8 etc.).

    `height`/`width` are latent-space sizes (pixels//8).
    """
    b, s, d = tokens.shape
    hh, ww, c = height // 2, width // 2, d // 4
    x = tokens.reshape(b, hh, ww, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, hh, P, ww, Q, C]
    return x.reshape(b, height, width, c)
