"""Blockwise ControlNet for the Qwen-Image DiT.

Rebuilds diffsynth/models/qwen_image_controlnet.py: a per-DiT-block residual
controller — `img_in: 64(+4 inpaint)->3072`, then one
RMSNorm(x)+RMSNorm(y) -> Linear -> GELU -> Linear (zero-init out) block per
DiT layer, added to the image stream after each DiT block and gated by a
per-step progress window and scale
(qwen_image_physical.py:157-180,1373-1396).

The 60 control blocks are stacked along the layer axis so they ride the
same ``lax.scan`` as the DiT blocks (models/dit.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.core.params import linear, linear_init, stack_trees
from physicedit_tpu.ops.norms import rms_norm


def control_block(p, x, y, eps: float = 1e-6):
    """x: image tokens [B, S, dim]; y: processed conditioning [B, S, dim]."""
    h = rms_norm(x, p["x_rms"]["scale"], eps) + rms_norm(y, p["y_rms"]["scale"], eps)
    h = jax.nn.gelu(linear(p["input_proj"], h), approximate=False)
    return linear(p["output_proj"], h)


def process_conditioning(params, cond_tokens):
    """Patchified conditioning latents [B, S, 64(+4)] -> [B, S, dim]."""
    return linear(params["img_in"], cond_tokens)


def controlnet_step_scales(num_inference_steps: int, start: float = 1.0,
                           end: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Per-step gate (qwen_image_physical.py:172-179): active when
    progress = (T-1-i)/(T-1) lies within [end, start]."""
    t = num_inference_steps
    progress = (t - 1 - np.arange(t)) / max(t - 1, 1)
    active = (progress <= start + 1e-4) & (progress >= end - 1e-4)
    return np.where(active, scale, 0.0).astype(np.float32)


def init_controlnet_params(key, num_layers: int = 60, in_dim: int = 64,
                           additional_in_dim: int = 0, dim: int = 3072,
                           dtype=jnp.float32):
    ks = iter(jax.random.split(key, 2 + num_layers))

    def block(k):
        kk = iter(jax.random.split(k, 2))
        return {
            "x_rms": {"scale": jnp.ones((dim,), dtype)},
            "y_rms": {"scale": jnp.ones((dim,), dtype)},
            "input_proj": linear_init(next(kk), dim, dim, dtype),
            # zero-init output (reference init_weights, qwen_image_controlnet.py:23-26)
            "output_proj": {"w": jnp.zeros((dim, dim), dtype),
                            "b": jnp.zeros((dim,), dtype)},
        }

    return {
        "img_in": linear_init(next(ks), in_dim + additional_in_dim, dim, dtype),
        "blocks": stack_trees([block(next(ks)) for _ in range(num_layers)]),
    }


def controlnet_from_torch(sd: dict, dtype=jnp.bfloat16):
    """Reference key space (img_in, controlnet_blocks.{i}.*) -> pytree."""
    from physicedit_tpu.io.convert import _lin, _t

    num_layers = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("controlnet_blocks."))

    def block(i):
        b = f"controlnet_blocks.{i}"
        return {
            "x_rms": {"scale": _t(sd, b + ".x_rms.weight", dtype)},
            "y_rms": {"scale": _t(sd, b + ".y_rms.weight", dtype)},
            "input_proj": _lin(sd, b + ".input_proj", dtype),
            "output_proj": _lin(sd, b + ".output_proj", dtype),
        }

    return {
        "img_in": _lin(sd, "img_in", dtype),
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[block(i) for i in range(num_layers)]),
    }
