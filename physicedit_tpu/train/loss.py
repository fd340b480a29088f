"""Training losses: flow-matching MSE + special-token (adapter) loss.

Mirrors QwenImagePhysicPipeline.training_loss
(qwen_image_physical.py:313-329) with the reference's trainable surface
(train_multigpu.sh:30-37): rank-128 LoRA on the frozen DiT plus full
training of the visual-thinking adapter and both resampler branches.

Two load-bearing reference semantics preserved here:
- the pseudo targets (DINO / VAE feature deltas) are computed INSIDE the
  differentiated forward through the trainable resamplers
  (qwen_image_physical.py:992-1120 runs as a pipeline unit within
  forward_preprocess), so the adapter MSE pulls on both its heads and the
  resampler branches;
- the special-token rewrite happens before the DiT forward
  (qwen_image_physical.py:1333-1336), so the DiT's flow loss backprops into
  the dual adapter as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physicedit_tpu.models.adapters import (
    dual_adapter_forward, dual_adapter_loss, perceiver_resampler,
    visual_thinking_adapter)
from physicedit_tpu.models.dit import DiTConfig, dit_forward
from physicedit_tpu.ops.patchify import patchify, unpatchify


def _prior_branch(resampler_p, adapter_p, time_embed, feats,
                  frame_mask=None):
    """feats: [B, F, N, dim] -> [B, 64, 3584] pseudo embedding.

    Frame-index embedding added per frame, frames flattened into one media
    sequence, Perceiver + projector (qwen_image_physical.py:1068-1117).
    frame_mask: optional [B, F] bool — zero-padded frames (samples with
    fewer than MAX_KEY_FRAMES key frames in a fixed-shape batch) are
    masked out of the resampler keys; the reference never pads.
    """
    b, f, n, d = feats.shape
    if time_embed is not None:
        feats = feats + time_embed[:f][None, :, None, :].astype(feats.dtype)
    tokens = feats.reshape(b, f * n, d)
    media_mask = (None if frame_mask is None
                  else jnp.repeat(frame_mask, n, axis=1))
    return visual_thinking_adapter(
        adapter_p, perceiver_resampler(resampler_p, tokens,
                                       media_mask=media_mask))


def compute_pseudo_targets(adapters: dict, batch: dict):
    """(gt_dino, gt_vae), each [B, 64, 3584], from raw frozen-backbone
    features carried in the batch:
      dino_mid_feats [B, F, N, 768], dino_src_feats [B, 1, N, 768]
      vae_mid_tokens [B, F, S, 64],  vae_src_tokens [B, 1, S, 64]
    """
    fmask = batch.get("mid_frame_mask")  # [B, F] bool or None (all real)
    gt_dino = (
        _prior_branch(adapters["dino_resampler"], adapters["dino_resampler_adapter"],
                      adapters["dino_time_embed"], batch["dino_mid_feats"],
                      frame_mask=fmask)
        - _prior_branch(adapters["dino_resampler"], adapters["dino_resampler_adapter"],
                        None, batch["dino_src_feats"]))
    gt_vae = (
        _prior_branch(adapters["vae_resampler"], adapters["vae_resampler_adapter"],
                      adapters["vae_time_embed"], batch["vae_mid_tokens"],
                      frame_mask=fmask)
        - _prior_branch(adapters["vae_resampler"], adapters["vae_resampler_adapter"],
                        None, batch["vae_src_tokens"]))
    return gt_dino, gt_vae


def physic_training_loss(
    trainable: dict,
    frozen: dict,
    cfg: DiTConfig,
    batch: dict,
    t_min: float,
    t_max: float,
    attn_impl: str = "xla",
    use_remat: bool = False,
):
    """(loss, metrics) for one batch.

    trainable: {"lora": DiT LoRA factors or None,
                "adapters": {visual_thinking_adapter, dino_resampler, ...}}
    frozen:    {"dit": frozen DiT base params}
    batch keys: input_latents/noise/sigma/timestep/weight [B,...],
      edit_tokens [B,S_e,64] or None, prompt_emb [B,S_t,3584],
      txt_mask [B,S_t], special_idx [B,64], the four raw-feature arrays for
      compute_pseudo_targets, and the RoPE tables.
    """
    adapters = trainable["adapters"]
    x0 = batch["input_latents"]
    noise = batch["noise"]
    sigma = batch["sigma"][:, None, None, None]
    latents = (1.0 - sigma) * x0 + sigma * noise
    target = noise - x0

    gt_dino, gt_vae = compute_pseudo_targets(adapters, batch)

    prompt_emb = batch["prompt_emb"]
    special = jnp.take_along_axis(
        prompt_emb, batch["special_idx"][:, :, None].astype(jnp.int32), axis=1)
    mixed, pred_dino, pred_vae = dual_adapter_forward(
        adapters["visual_thinking_adapter"], special, batch["timestep"],
        t_min, t_max)
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
        frozen["dit"], cfg, img_tokens, prompt_emb,
        (batch["timestep"] / 1000.0).astype(prompt_emb.dtype),
        batch["img_cos"], batch["img_sin"], batch["txt_cos"], batch["txt_sin"],
        txt_key_mask=batch["txt_mask"], attn_impl=attn_impl,
        use_remat=use_remat, lora=trainable.get("lora"))
    v = unpatchify(v[:, :s_base], h, w)

    # Per-sample weighting (reference training_loss, qwen_image_physical
    # .py:324-328 applies each sample's bell weight to ITS error): weight_i
    # scales sample i's mean-square error, then average over the batch —
    # NOT mean(weight) * mean(mse), which mis-weights mixed-timestep
    # batches.
    sq = jnp.square(v.astype(jnp.float32) - target.astype(jnp.float32))
    per_sample = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
    mse = jnp.mean(per_sample)
    adapter = dual_adapter_loss(
        pred_dino, pred_vae, gt_dino, gt_vae, batch["timestep"], t_min, t_max)
    loss = jnp.mean(per_sample * batch["weight"].astype(jnp.float32)) + adapter
    return loss, {"mse": mse, "special_token_loss": adapter}


def direct_distill_loss(dit_params, cfg: DiTConfig, latents0, extra_tokens,
                        prompt_emb, txt_mask, ropes, sched, input_latents,
                        lora=None, attn_impl: str = "xla"):
    """Full-unroll distillation loss (QwenImagePhysicPipeline.direct_distill_loss,
    qwen_image_physical.py:332-340): run the whole denoise schedule
    differentiably and regress the result onto the clean latents.

    The denoise scan is already differentiable, so this is a thin wrapper;
    gradients flow through every step (use few steps / remat for memory).
    """
    import jax.numpy as jnp

    from physicedit_tpu.sampling.denoise import denoise

    out = denoise(
        dit_params, cfg, latents0, extra_tokens, prompt_emb, txt_mask,
        *ropes, jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
        jnp.asarray(sched.timesteps), jnp.asarray(1.0),
        latent_hw=(latents0.shape[1], latents0.shape[2]),
        attn_impl=attn_impl, lora=lora)
    return jnp.mean(jnp.square(out.astype(jnp.float32)
                               - input_latents.astype(jnp.float32)))
