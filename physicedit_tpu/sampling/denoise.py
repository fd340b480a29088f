"""The CFG flow-matching denoise loop as a single jitted ``lax.scan``.

Replaces the reference's Python step loop (qwen_image_physical.py:648-661)
with one compiled program:
- positive and negative prompts are batched along the batch axis (the
  reference runs two separate model calls per step; with key-side attention
  masking the batched form is mathematically identical and halves dispatch
  overhead),
- the per-step special-token rewrite (qwen_image_physical.py:1333-1336) is
  applied inside the scan.  NB the reference mutates `prompt_emb` in place,
  so the rewritten tokens feed the adapter again at the next step; we
  reproduce that by carrying `prompt_emb` through the scan.
- the Euler update consumes precomputed (sigma, sigma_next) arrays from
  sampling/flow_match.py as scan inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from physicedit_tpu.models.dit import DiTConfig, dit_forward
from physicedit_tpu.models.adapters import dual_adapter_forward
from physicedit_tpu.ops.patchify import patchify, unpatchify


def _rewrite_special_tokens(adapter_params, prompt_emb, special_idx, timestep,
                            t_min, t_max):
    """Gather the 64 special-token embeddings, run the dual adapter, scatter
    back.  special_idx: [B, 64] int32 positions into the padded text axis."""
    special = jnp.take_along_axis(
        prompt_emb, special_idx[:, :, None].astype(jnp.int32), axis=1)
    mixed, _, _ = dual_adapter_forward(adapter_params, special, timestep, t_min, t_max)
    b_idx = jnp.arange(prompt_emb.shape[0])[:, None]
    return prompt_emb.at[b_idx, special_idx].set(mixed.astype(prompt_emb.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "t_min", "t_max", "latent_hw",
                     "slim_last", "attn_clamp", "cfg_truncate_after"),
)
def denoise(
    dit_params,
    cfg: DiTConfig,
    latents,            # [1, h, w, 16] initial noise (latent space, NHWC)
    extra_img_tokens,   # [1, S_extra, 64] edit/context tokens or None
    prompt_emb,         # [B, S_t, 3584]  B=2 for CFG (posi, nega), else 1
    txt_mask,           # [B, S_t] bool
    img_cos, img_sin, txt_cos, txt_sin,
    sigmas, sigmas_next, timesteps,   # [T] schedule arrays
    cfg_scale: jax.Array,             # scalar (traced; 1.0 disables combine)
    latent_hw: tuple,                 # static (h, w) of the latent grid
    adapter_params=None,
    special_idx=None,   # [B, 64] int32 or None
    t_min: float = 0.0,
    t_max: float = 1000.0,
    attn_impl: str = "xla",
    control_blocks=None,   # stacked blockwise-ControlNet blocks or None
    control_cond=None,     # [B, S_base, dim] processed conditioning
    control_scales=None,   # [T] per-step gate (controlnet_step_scales)
    lora=None,             # trainable DiT LoRA factors (train-time eval)
    attn_bias=None,        # [B, S, S] EliGen entity-mask bias
    inpaint_mask=None,     # [1, h, w, 1] in [0,1]; 1 = repaint region
    input_latents=None,    # [1, h, w, 16] clean latents (inpaint source)
    slim_last: bool = True,  # last DiT block computes only the base rows
    attn_clamp: bool = True,  # overflow clamp in the fixed-max kernel
                              # (models/dit.attn_clamp_needed at load time)
    cfg_truncate_after: int | None = None,
    # Opt-in serving accelerator (NOT the reference workload, which runs
    # CFG 4.0 for all steps): steps [0, k) run the full CFG batch, steps
    # [k, T) run the POSITIVE rows only (the negative branch contributes
    # little at low sigma; standard CFG-interval practice).  Each late
    # step costs ~half.  None / k >= T disables (default); k=0 runs
    # positives-only from the first step; negative k is an error.
):
    """Run the full denoise schedule; returns final latents [N, h, w, 16].

    Batched serving: ``latents`` may carry N independent same-resolution
    edits; ``prompt_emb`` then has 2N rows under CFG (positives first,
    negatives last) or N rows without.  N=1 is the single-edit path.
    """
    h, w = latent_hw
    n_items = latents.shape[0]
    batch = prompt_emb.shape[0]
    reps = batch // n_items  # 2 under CFG
    dtype = prompt_emb.dtype

    use_control = control_blocks is not None
    scales = control_scales if use_control else sigmas  # placeholder xs

    def make_step(batch_l, reps_l, txt_mask_l, special_idx_l, attn_bias_l,
                  control_cond_l):
        # EliGen carries per-CFG-row text rope tables [B, 1, s_t, 64]
        # (edit_pipeline.py); slice them to this lane's batch so the
        # positive-only cfg_truncate lane doesn't broadcast batch 2 text
        # queries against batch-1 image queries.
        txt_cos_l = txt_cos[:batch_l] if txt_cos.ndim == 4 else txt_cos
        txt_sin_l = txt_sin[:batch_l] if txt_sin.ndim == 4 else txt_sin
        def step(carry, inputs):
            latents, prompt_emb = carry
            sigma, sigma_next, timestep, ctl_scale = inputs

            p_emb = prompt_emb
            if adapter_params is not None and special_idx_l is not None:
                p_emb = _rewrite_special_tokens(
                    adapter_params, prompt_emb, special_idx_l,
                    jnp.broadcast_to(timestep, (batch_l,)), t_min, t_max)

            img_tokens = patchify(latents.astype(dtype))
            if extra_img_tokens is not None:
                extra = jnp.broadcast_to(
                    extra_img_tokens.astype(dtype),
                    (n_items,) + extra_img_tokens.shape[1:])
                img_tokens = jnp.concatenate([img_tokens, extra], axis=1)
            if reps_l > 1:  # CFG: positives rows [0,N), negatives [N,2N)
                img_tokens = jnp.tile(img_tokens, (reps_l, 1, 1))

            t_norm = jnp.broadcast_to(
                timestep / 1000.0, (batch_l,)).astype(dtype)
            control = None
            if use_control:
                control = {"blocks": control_blocks, "cond": control_cond_l,
                           "scale": ctl_scale}
            # Last-block slimming (models/dit.py): the final block computes
            # only the base-image rows that survive the slice below.  Gated
            # off when LoRA factors / ControlNet residuals / ring attention
            # need the full last block.
            slim = ((h // 2) * (w // 2)
                    if (slim_last and lora is None and control is None
                        and attn_impl != "ring") else 0)
            out = dit_forward(dit_params, cfg, img_tokens, p_emb, t_norm,
                              img_cos, img_sin, txt_cos_l, txt_sin_l,
                              txt_key_mask=txt_mask_l, attn_impl=attn_impl,
                              control=control, lora=lora,
                              attn_bias=attn_bias_l,
                              slim_last=slim, attn_clamp=attn_clamp)
            base_tokens = out[:, : (h // 2) * (w // 2)]
            v = unpatchify(base_tokens, h, w)

            if reps_l == 2:
                v_posi, v_nega = v[:n_items], v[n_items:]
                v = v_nega + cfg_scale * (v_posi - v_nega)
            if inpaint_mask is not None and input_latents is not None:
                # Outside the mask, replace the prediction with the velocity
                # implied by the clean latents (BasePipeline.step inpaint
                # blending, utils/__init__.py:150-156 + flow_match.py:85-91).
                expected = (latents.astype(jnp.float32)
                            - input_latents.astype(jnp.float32)) / sigma
                v = (expected * (1.0 - inpaint_mask)
                     + v.astype(jnp.float32) * inpaint_mask)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32)
                       * (sigma_next - sigma)).astype(latents.dtype)
            return (latents, p_emb), None

        return step

    step = make_step(batch, reps, txt_mask, special_idx, attn_bias,
                     control_cond)
    k = cfg_truncate_after
    if k is not None and k < 0:
        raise ValueError(f"cfg_truncate_after must be >= 0, got {k}")
    if k is not None and reps == 2 and k < sigmas.shape[0]:
        (latents, p_emb2), _ = jax.lax.scan(
            step, (latents, prompt_emb),
            (sigmas[:k], sigmas_next[:k], timesteps[:k], scales[:k]))
        # Late steps: positive rows only (rows [0, N)); the per-step
        # special-token rewrite keeps feeding the positives' adapter.
        step_pos = make_step(
            n_items, 1,
            txt_mask[:n_items],
            None if special_idx is None else special_idx[:n_items],
            None if attn_bias is None else attn_bias[:n_items],
            None if control_cond is None else control_cond[:n_items])
        (latents, _), _ = jax.lax.scan(
            step_pos, (latents, p_emb2[:n_items]),
            (sigmas[k:], sigmas_next[k:], timesteps[k:], scales[k:]))
        return latents

    (latents, _), _ = jax.lax.scan(
        step, (latents, prompt_emb), (sigmas, sigmas_next, timesteps, scales))
    return latents
