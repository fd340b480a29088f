"""Qwen2.5-VL prompt-enhancement embedder (legacy zoo, SURVEY M7).

Parity with the reference `Qwen25VL_7b_Embedder`
(diffsynth/models/qwenvl.py:4-167, mapped by the registry's HF-folder
arch table `Qwen2_5_VLForConditionalGeneration` ->
`Qwen25VL_7b_Embedder`, configs/model_config.py:29-33): encodes a
caption + reference image through Qwen2.5-VL with a fixed
prompt-enhancement instruction prefix and returns fixed-length (640)
last-hidden-state buffers + masks for a downstream generator (NexusGen).

Reference quirks reproduced:
- quotes in the rendered chat string are re-tokenized char-by-char (the
  `split_string` surgery, qwenvl.py:145-170 — quoted spans after
  char 155 become per-character CJK-quoted segments so the tokenizer
  cannot merge them), and the re-tokenized text segment is spliced onto
  the original ids at the first `<|vision_end|>` (151653);
- hidden states are taken from position 217 on (the tokenized prefix +
  chat scaffolding length) and right-padded/truncated to 640.

The tokenizer/processor is injectable (this environment cannot download
HF tokenizer files); the array-side core is pure JAX over the existing
Qwen2.5-VL rebuild.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from physicedit_tpu.models import qwen_vl as VL

MAX_LENGTH = 640
PREFIX_TOKEN_OFFSET = 217          # qwenvl.py:160-165
VISION_END_ID = 151653

# Behavioral constant — must match the reference verbatim (qwenvl.py:23-32).
QWEN25VL_7B_PREFIX = '''Given a user prompt, generate an "Enhanced prompt" that provides detailed visual descriptions suitable for image generation. Evaluate the level of detail in the user prompt:
- If the prompt is simple, focus on adding specifics about colors, shapes, sizes, textures, and spatial relationships to create vivid and concrete scenes.
- If the prompt is already detailed, refine and enhance the existing details slightly without overcomplicating.\n
Here are examples of how to transform or refine prompts:
- User Prompt: A cat sleeping -> Enhanced: A small, fluffy white cat curled up in a round shape, sleeping peacefully on a warm sunny windowsill, surrounded by pots of blooming red flowers.
- User Prompt: A busy city street -> Enhanced: A bustling city street scene at dusk, featuring glowing street lamps, a diverse crowd of people in colorful clothing, and a double-decker bus passing by towering glass skyscrapers.\n
Please generate only the enhanced description for the prompt below and avoid including any additional commentary or evaluations:
User Prompt:'''


def split_string(s: str) -> list:
    """Reference qwenvl.py:145-170: normalize quotes to english double
    quotes, then split the string so that each quoted character past
    index 155 becomes its own CJK-quoted segment."""
    s = s.replace("“", '"').replace("”", '"').replace("'", '"')
    result = []
    in_quotes = False
    temp = ""
    for idx, char in enumerate(s):
        if char == '"' and idx > 155:
            temp += char
            if not in_quotes:
                result.append(temp)
                temp = ""
            in_quotes = not in_quotes
            continue
        if in_quotes:
            if char.isspace():
                pass  # have space token
            result.append("“" + char + "”")
        else:
            temp += char
    if temp:
        result.append(temp)
    return result


def retokenize_with_quote_splice(input_ids, text: str, tokenize_fn):
    """Reference qwenvl.py:137-160: re-tokenize `text` segment-by-segment
    (dropping the CJK quote marks 2073/854 the per-char segments pick up),
    then splice: original ids up to the first <|vision_end|> + re-tokenized
    ids from ITS first <|vision_end|>.

    tokenize_fn: str -> list[int] (no special tokens added).
    """
    token_list = []
    for seg in split_string(text):
        toks = tokenize_fn(seg)
        if len(toks) >= 2 and toks[0] == 2073 and toks[-1] == 854:
            toks = toks[1:-1]
        token_list.extend(toks)
    old = list(input_ids)
    idx1 = old.index(VISION_END_ID)
    idx2 = token_list.index(VISION_END_ID)
    return old[:idx1] + token_list[idx2:]


def extract_embeddings(hidden, max_length: int = MAX_LENGTH,
                       offset: int = PREFIX_TOKEN_OFFSET):
    """Last-hidden states [1, S, D] -> fixed ([1, max_length, D] buffer,
    [1, max_length] int mask) per the reference layout (qwenvl.py:160-167:
    positions `offset:` copied in, zero-padded, ones mask over the copied
    span)."""
    s, d = hidden.shape[1], hidden.shape[2]
    n = max(min(max_length, s - offset), 0)
    emb = jnp.zeros((1, max_length, d), hidden.dtype)
    emb = emb.at[:, :n].set(hidden[:, offset:offset + n])
    mask = jnp.zeros((1, max_length), jnp.int32).at[:, :n].set(1)
    return emb, mask


def embed(text_params, cfg: VL.QwenVLTextConfig, input_ids, vision_embeds,
          grids, max_length: int = MAX_LENGTH):
    """Array-side core: scatter image features, run the decoder, extract
    the fixed-length enhancement embedding.

    input_ids: [1, S] (quote-spliced, image pads expanded);
    vision_embeds: [n_img, D] merged ViT features; grids: per-image
    (t, h, w).  Returns (emb [1, max_length, D], mask [1, max_length]).
    """
    from physicedit_tpu.pipeline.vl_host import (get_rope_index,
                                                 scatter_vision_features)

    ids = np.asarray(input_ids)
    token_embeds = np.asarray(
        VL.embed_tokens(text_params, jnp.asarray(ids)), np.float32)
    emb_in = scatter_vision_features(
        token_embeds[0], ids[0], np.asarray(vision_embeds, np.float32),
        image_token_id=151655)
    pos = jnp.asarray(get_rope_index(ids[0], grids, 151655, 151652))[:, None]
    hidden = VL.text_forward(text_params, cfg, jnp.asarray(emb_in[None]),
                             pos, jnp.ones(ids.shape, bool))
    return extract_embeddings(hidden, max_length)
