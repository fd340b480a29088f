"""Torch-checkpoint -> parameter-pytree converters.

Each converter maps the reference's state-dict key space onto this
framework's pytree layout:
- linear weights are transposed to (in, out),
- the 60 DiT blocks are stacked along a leading layer axis,
- per-stream q/k/v projections are fused into a single (in, 3*dim) matmul.

Key spaces documented against the reference modules:
- DiT: diffsynth/models/qwen_image_dit.py:404-430 (civitai format, no remap)
- VAE: diffsynth/models/qwen_image_vae.py:640-704
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t(sd, name, dtype):
    """Fetch a tensor as numpy (handles torch tensors incl. bfloat16)."""
    v = sd[name]
    if not isinstance(v, np.ndarray):
        try:
            v = v.float().numpy() if v.dtype.__str__() == "torch.bfloat16" else v.numpy()
        except Exception:
            v = np.asarray(v, dtype=np.float32)
    return jnp.asarray(v, dtype=dtype)


def _lin(sd, prefix, dtype, bias=True):
    p = {"w": _t(sd, prefix + ".weight", dtype).T}
    if bias and prefix + ".bias" in sd:
        p["b"] = _t(sd, prefix + ".bias", dtype)
    return p


def _fused_qkv(sd, prefixes, dtype):
    """Concatenate q/k/v linear layers into one (in, 3*out) projection."""
    ws = [np.asarray(_t(sd, p + ".weight", jnp.float32).T) for p in prefixes]
    bs = [np.asarray(_t(sd, p + ".bias", jnp.float32)) for p in prefixes]
    return {
        "w": jnp.asarray(np.concatenate(ws, axis=1), dtype=dtype),
        "b": jnp.asarray(np.concatenate(bs, axis=0), dtype=dtype),
    }


def dit_from_torch(sd: dict, num_layers: int | None = None, dtype=jnp.bfloat16):
    """Convert a Qwen-Image DiT state dict to the stacked-block pytree.

    `sd` uses the reference key space (transformer_blocks.{i}.*, img_in, ...).
    """
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("transformer_blocks.")
        )

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "img_mod": _lin(sd, f"{b}.img_mod.1", dtype),
            "txt_mod": _lin(sd, f"{b}.txt_mod.1", dtype),
            "attn": {
                "img_qkv": _fused_qkv(
                    sd, [f"{b}.attn.to_q", f"{b}.attn.to_k", f"{b}.attn.to_v"], dtype),
                "txt_qkv": _fused_qkv(
                    sd, [f"{b}.attn.add_q_proj", f"{b}.attn.add_k_proj",
                         f"{b}.attn.add_v_proj"], dtype),
                "norm_q": {"scale": _t(sd, f"{b}.attn.norm_q.weight", dtype)},
                "norm_k": {"scale": _t(sd, f"{b}.attn.norm_k.weight", dtype)},
                "norm_added_q": {"scale": _t(sd, f"{b}.attn.norm_added_q.weight", dtype)},
                "norm_added_k": {"scale": _t(sd, f"{b}.attn.norm_added_k.weight", dtype)},
                "to_out": _lin(sd, f"{b}.attn.to_out.0", dtype),
                "to_add_out": _lin(sd, f"{b}.attn.to_add_out", dtype),
            },
            "img_mlp": {
                "fc1": _lin(sd, f"{b}.img_mlp.net.0.proj", dtype),
                "fc2": _lin(sd, f"{b}.img_mlp.net.2", dtype),
            },
            "txt_mlp": {
                "fc1": _lin(sd, f"{b}.txt_mlp.net.0.proj", dtype),
                "fc2": _lin(sd, f"{b}.txt_mlp.net.2", dtype),
            },
        }

    import jax

    blocks = [block(i) for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    return {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_norm": {"scale": _t(sd, "txt_norm.weight", dtype)},
        "txt_in": _lin(sd, "txt_in", dtype),
        "time_embed": {
            "linear_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1", dtype),
            "linear_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2", dtype),
        },
        "norm_out": {"linear": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
        "blocks": stacked,
    }
