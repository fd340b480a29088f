"""EliGen entity-control: host-side attention-mask construction.

Rebuilds QwenImageDiT.process_entity_masks (qwen_image_dit.py:433-498) as a
NumPy builder producing a head-shared additive bias consumed by the
bias-capable flash kernel:

- the text stream becomes [entity_1 .. entity_N, global] prompt embeddings
  concatenated on the sequence axis,
- each entity's prompt tokens may only attend image tokens whose 2x2 patch
  overlaps the entity's spatial mask (both directions); the global prompt
  sees everything,
- different prompt groups are mutually invisible,
- per-segment text RoPE restarts at max_vid_index (qwen_image_dit.py:441-445).
"""

from __future__ import annotations

import numpy as np

NEG = -1e30


def patch_presence(mask_latent: np.ndarray) -> np.ndarray:
    """[h, w] bool latent-resolution mask -> [h/2 * w/2] per-token presence
    (any active pixel in the 2x2 patch, qwen_image_dit.py:461,475)."""
    h, w = mask_latent.shape
    m = mask_latent.reshape(h // 2, 2, w // 2, 2)
    return m.any(axis=(1, 3)).reshape(-1)


def build_entity_bias(entity_masks_latent: list, seq_lens: list,
                      image_seq_len: int, base_image_tokens: int) -> np.ndarray:
    """Additive attention bias [S, S] (0 valid / NEG blocked).

    entity_masks_latent: per-entity [h, w] bool at latent resolution (h/8).
    seq_lens: text lengths [entity_1..entity_N, global].
    image_seq_len: total image tokens (base + edit/context).
    base_image_tokens: tokens of the base image grid (the mask tiles over
    any extra image tokens, qwen_image_dit.py:477-479).
    """
    n_prompts = len(seq_lens)
    n_entities = len(entity_masks_latent)
    assert n_prompts == n_entities + 1, "last segment is the global prompt"
    txt_total = int(np.sum(seq_lens))
    total = txt_total + image_seq_len
    allow = np.ones((total, total), bool)

    starts = np.concatenate([[0], np.cumsum(seq_lens)]).astype(int)
    img_start = txt_total
    # The reference has the same exact-multiple constraint (repeat_time =
    # single_image_seq // mask_len then a fixed-width assignment,
    # qwen_image_dit.py:477-484) — surface it instead of a broadcast error.
    if image_seq_len % base_image_tokens:
        raise ValueError(
            f"EliGen entity masks need the joint image sequence "
            f"({image_seq_len} tokens) to be a whole multiple of the base "
            f"grid ({base_image_tokens}): give edit/context images the "
            f"output resolution")
    repeat = image_seq_len // base_image_tokens

    presence = [np.tile(patch_presence(m), repeat) for m in entity_masks_latent]
    presence.append(np.ones(image_seq_len, bool))  # global prompt sees all

    for i in range(n_prompts):
        p0, p1 = starts[i], starts[i + 1]
        allow[p0:p1, img_start:] = presence[i][None, :]
        allow[img_start:, p0:p1] = presence[i][:, None]
    for i in range(n_prompts):
        for j in range(n_prompts):
            if i != j:
                allow[starts[i]:starts[i + 1], starts[j]:starts[j + 1]] = False

    return np.where(allow, 0.0, NEG).astype(np.float32)


def downsample_entity_mask(mask_image, lat_h: int, lat_w: int) -> np.ndarray:
    """PIL mask -> [lat_h, lat_w] bool (nearest, mean>0 like the reference's
    preprocess_masks, qwen_image_physical.py:1156-1162)."""
    from PIL import Image

    m = mask_image.convert("L").resize((lat_w, lat_h), Image.NEAREST)
    return np.asarray(m) > 127
