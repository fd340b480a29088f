"""Nexus-Gen autoregressive image-editing model, TPU-native (SURVEY M7).

Capability parity with the reference legacy-zoo model
(diffsynth/models/nexus_gen.py:5-161 + nexus_gen_ar_model.py:397-830):
a Qwen2.5-VL-7B decoder with two extra heads —

- ``vision_head``: Linear(hidden, hidden, bias=False) emitting predicted
  image embeddings at every position (nexus_gen_ar_model.py:408);
- ``image_prefill_embeds``: nn.Embedding(81, hidden) of learned query
  embeddings standing in for the 81 target-image tokens
  (nexus_gen_ar_model.py:410).

The model's registry-exposed path is the TEACHER-FORCED single forward
(`NexusGenAutoregressiveModel.forward`, nexus_gen.py:101-115): build a
chat with the instruction (+ reference image), replace the last 81
image-pad positions with the prefill queries, run the causal decoder
once, and read the vision_head outputs at the positions *preceding* each
target-image token (nexus_gen.py:116-152).  The incremental `.generate`
override in the vendored HF fork is unused by any pipeline in the
reference snapshot and is a documented divergence.

Everything below composes the existing Qwen2.5-VL rebuild
(models/qwen_vl.py for the decoder, models/qwen_vl_vision.py for the
ViT, pipeline/vl_host.py for grids and M-RoPE indices).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.core.params import linear, linear_init
from physicedit_tpu.models import qwen_vl as VL

NUM_IMG_TOKENS = 81            # 252x252 white target @ patch 14, merge 2
IMAGE_TOKEN_ID = 151655
VISION_START_ID = 151652
VISION_END_ID = 151653


def init_nexus_params(key, cfg: VL.QwenVLTextConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.hidden_size
    return {
        "text": VL.init_text_params(k1, cfg, dtype),
        "vision_head": linear_init(k2, d, d, dtype, bias=False),
        "image_prefill_embeds": (jax.random.normal(
            k3, (NUM_IMG_TOKENS, d), jnp.float32) * 0.02).astype(dtype),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def nexus_forward(params, cfg: VL.QwenVLTextConfig, input_ids, attn_mask,
                  position_ids, image_table):
    """Teacher-forced forward -> (lm logits, vision_head embeddings).

    input_ids: [B, S]; image_table: [B, n_img_positions, D] — per-sample
    replacement embeddings for the image-pad positions in order (input
    image features followed by the 81 prefill queries; the caller builds
    this concatenation so the masked_scatter semantics of the reference
    — nexus_gen.py:127-141 — reduce to an ordinal gather).
    """
    emb = VL.embed_tokens(params["text"], input_ids)
    mask = input_ids == IMAGE_TOKEN_ID
    ordinal = jnp.cumsum(mask, axis=1) - 1
    gathered = jnp.take_along_axis(
        image_table, jnp.clip(ordinal, 0, image_table.shape[1] - 1)[..., None],
        axis=1)
    emb = jnp.where(mask[..., None], gathered.astype(emb.dtype), emb)

    hidden = VL.text_forward(params["text"], cfg, emb, position_ids, attn_mask)
    logits = VL.lm_logits(params["text"], hidden)
    image_embeds = linear(params["vision_head"], hidden)
    return logits, image_embeds


def editing_messages(instruction: str) -> list:
    """nexus_gen.py:90-95."""
    if "<image>" not in instruction:
        instruction = "<image> " + instruction
    return [{"role": "user", "content": instruction},
            {"role": "assistant", "content": "Here is the image: <image>"}]


def generation_messages(instruction: str) -> list:
    """nexus_gen.py:97-100."""
    return [{"role": "user", "content":
             f"Generate an image according to the following description: "
             f"{instruction}"},
            {"role": "assistant", "content":
             "Here is an image based on the description: <image>"}]


def target_embeddings(params, cfg: VL.QwenVLTextConfig, input_ids,
                      input_image_embeds, grids):
    """Predicted embeddings for the target image (nexus_gen.py:116-152).

    input_ids: [1, S] with image-pad runs already expanded (the LAST run
    is the 81-token target); input_image_embeds: [n_in, D] ViT features
    of the reference image(s) (empty array for T2I); grids: list of
    (t, h, w) per image INCLUDING the target (for M-RoPE indices).
    Returns [81, D] — the vision_head outputs at the positions that
    predict each target-image token (shift-by-one gather).
    """
    from physicedit_tpu.pipeline.vl_host import get_rope_index

    ids = np.asarray(input_ids)
    assert ids.shape[0] == 1, "reference path is single-sample"
    d = params["image_prefill_embeds"].shape[-1]
    vis = jnp.asarray(input_image_embeds,
                      jnp.float32).reshape(-1, d) if np.asarray(
        input_image_embeds).size else jnp.zeros((0, d), jnp.float32)
    table = jnp.concatenate([
        vis, params["image_prefill_embeds"].astype(jnp.float32)], axis=0)[None]

    position_ids = jnp.asarray(get_rope_index(
        ids[0], grids, IMAGE_TOKEN_ID, VISION_START_ID))[:, None, :]
    attn = jnp.ones(ids.shape, bool)
    _, image_embeds = nexus_forward(params, cfg, jnp.asarray(ids), attn,
                                    position_ids, table)

    # positions whose NEXT token is a target-image token predict it
    img_pos = np.nonzero(ids[0] == IMAGE_TOKEN_ID)[0]
    gt_pos = img_pos[-NUM_IMG_TOKENS:]
    return image_embeds[0, gt_pos - 1]


# ---------------------------------------------------------------------------
# Conversion (registry hash 2bd19e845116e4f875a0a048e27fc219)
# ---------------------------------------------------------------------------

def nexus_llm_from_torch(sd: dict, dtype=jnp.bfloat16) -> dict:
    """Raw Nexus-Gen checkpoint -> nexus pytree.  The checkpoint uses
    HF-fork keys (``model.layers.* visual.* lm_head.* vision_head.*
    image_prefill_embeds.*``); remap onto the converters the Qwen2.5-VL
    rebuild already has."""
    from physicedit_tpu.io.convert import _lin, _t, qwen_vl_text_from_torch

    remapped = {}
    for k, v in sd.items():
        if k.startswith("model."):
            remapped["model.language_model." + k[len("model."):]] = v
        elif k.startswith("visual."):
            remapped["model." + k] = v
        else:
            remapped[k] = v
    return {
        "text": qwen_vl_text_from_torch(remapped, dtype),
        "vision_head": _lin(sd, "vision_head", dtype),
        "image_prefill_embeds": _t(sd, "image_prefill_embeds.weight", dtype),
    }


def nexus_vision_from_torch(sd: dict, dtype=jnp.bfloat16):
    from physicedit_tpu.io.convert import qwen_vl_vision_from_torch

    remapped = {("model." + k if k.startswith("visual.") else k): v
                for k, v in sd.items()}
    return qwen_vl_vision_from_torch(remapped, dtype)


def load_nexus_gen(path: str, dtype=jnp.bfloat16):
    """Load a Nexus-Gen checkpoint file -> (llm pytree, vision pytree)."""
    from physicedit_tpu.io.safetensors_io import load_state_dict

    sd = load_state_dict(path)
    return nexus_llm_from_torch(sd, dtype), nexus_vision_from_torch(sd, dtype)
