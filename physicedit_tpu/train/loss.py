"""Training losses: flow-matching MSE + special-token (adapter) loss.

Mirrors QwenImagePhysicPipeline.training_loss
(qwen_image_physical.py:313-329): sample a timestep, noise the target
latents, predict the velocity with the special-token rewrite active, and sum
  mse(v_pred, eps - x0) * bell_weight(t) + dual_adapter_loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from physicedit_tpu.models.adapters import dual_adapter_forward, dual_adapter_loss
from physicedit_tpu.models.dit import DiTConfig, dit_forward
from physicedit_tpu.ops.patchify import patchify, unpatchify


def physic_training_loss(
    dit_params,
    adapter_params,
    cfg: DiTConfig,
    batch: dict,
    t_min: float,
    t_max: float,
    attn_impl: str = "xla",
    use_remat: bool = False,
):
    """Compute (loss, metrics) for one batch.

    batch keys (all jnp arrays):
      input_latents [B, h, w, 16]   VAE latents of the target frame
      noise         [B, h, w, 16]
      sigma         [B]             noise level for the sampled timestep
      timestep      [B]             sigma * 1000
      weight        [B]             bell timestep weight
      edit_tokens   [B, S_e, 64]    patchified edit-image latents (or None)
      prompt_emb    [B, S_t, 3584]
      txt_mask      [B, S_t] bool
      special_idx   [B, 64] int32   positions of the special tokens
      gt_dino       [B, 64, 3584]   pseudo targets from the visual embedder
      gt_vae        [B, 64, 3584]
      img_cos/img_sin/txt_cos/txt_sin  RoPE tables
    """
    x0 = batch["input_latents"]
    noise = batch["noise"]
    sigma = batch["sigma"][:, None, None, None]
    latents = (1.0 - sigma) * x0 + sigma * noise
    target = noise - x0

    # Special-token rewrite + adapter predictions.
    prompt_emb = batch["prompt_emb"]
    special = jnp.take_along_axis(
        prompt_emb, batch["special_idx"][:, :, None].astype(jnp.int32), axis=1)
    mixed, pred_dino, pred_vae = dual_adapter_forward(
        adapter_params, special, batch["timestep"], t_min, t_max)
    b_idx = jnp.arange(prompt_emb.shape[0])[:, None]
    prompt_emb = prompt_emb.at[b_idx, batch["special_idx"]].set(
        mixed.astype(prompt_emb.dtype))

    img_tokens = patchify(latents.astype(prompt_emb.dtype))
    h, w = x0.shape[1], x0.shape[2]
    s_base = img_tokens.shape[1]
    if batch.get("edit_tokens") is not None:
        img_tokens = jnp.concatenate(
            [img_tokens, batch["edit_tokens"].astype(prompt_emb.dtype)], axis=1)

    v = dit_forward(
        dit_params, cfg, img_tokens, prompt_emb,
        (batch["timestep"] / 1000.0).astype(prompt_emb.dtype),
        batch["img_cos"], batch["img_sin"], batch["txt_cos"], batch["txt_sin"],
        txt_key_mask=batch["txt_mask"], attn_impl=attn_impl, use_remat=use_remat)
    v = unpatchify(v[:, :s_base], h, w)

    mse = jnp.mean(jnp.square(v.astype(jnp.float32) - target.astype(jnp.float32)))
    adapter = dual_adapter_loss(
        pred_dino, pred_vae, batch["gt_dino"], batch["gt_vae"],
        batch["timestep"], t_min, t_max)
    loss = mse * jnp.mean(batch["weight"]) + adapter
    return loss, {"mse": mse, "special_token_loss": adapter}
