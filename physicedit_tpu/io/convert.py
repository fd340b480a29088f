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


def dit_block_from_torch(sd: dict, i: int, dtype=jnp.bfloat16):
    """One transformer block (key space transformer_blocks.{i}.*)."""
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


def dit_blocks_from_torch(sd: dict, num_layers: int, dtype=jnp.bfloat16):
    import jax

    blocks = [dit_block_from_torch(sd, i, dtype) for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def dit_from_torch(sd: dict, num_layers: int | None = None, dtype=jnp.bfloat16):
    """Convert a Qwen-Image DiT state dict to the stacked-block pytree.

    `sd` uses the reference key space (transformer_blocks.{i}.*, img_in, ...).
    """
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("transformer_blocks.")
        )

    stacked = dit_blocks_from_torch(sd, num_layers, dtype)

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


# ---------------------------------------------------------------------------
# VAE converter
# ---------------------------------------------------------------------------

def _conv3d_tap(sd, prefix, dtype):
    """Causal Conv3d -> 2D conv weights for image mode.

    With 2 leading zero-pad frames and T=1 input, only the last temporal tap
    of the kernel ever touches data (qwen_image_vae.py:40-50), so the 2D
    equivalent is weight[:, :, -1] transposed to HWIO.
    """
    w = np.asarray(_t(sd, prefix + ".weight", jnp.float32))
    if w.ndim == 5:
        w = w[:, :, -1]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype=dtype),
        "b": _t(sd, prefix + ".bias", dtype),
    }


def _vae_norm(sd, prefix, dtype):
    g = np.asarray(_t(sd, prefix + ".gamma", jnp.float32)).reshape(-1)
    return {"gamma": jnp.asarray(g, dtype=dtype)}


def _vae_res(sd, prefix, dtype):
    p = {
        "norm1": _vae_norm(sd, prefix + ".norm1", dtype),
        "conv1": _conv3d_tap(sd, prefix + ".conv1", dtype),
        "norm2": _vae_norm(sd, prefix + ".norm2", dtype),
        "conv2": _conv3d_tap(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".conv_shortcut.weight" in sd:
        p["shortcut"] = _conv3d_tap(sd, prefix + ".conv_shortcut", dtype)
    return p


def _vae_attn(sd, prefix, dtype):
    return {
        "norm": _vae_norm(sd, prefix + ".norm", dtype),
        "to_qkv": _conv3d_tap(sd, prefix + ".to_qkv", dtype),
        "proj": _conv3d_tap(sd, prefix + ".proj", dtype),
    }


def _vae_mid(sd, prefix, dtype):
    return {
        "res0": _vae_res(sd, prefix + ".resnets.0", dtype),
        "attn": _vae_attn(sd, prefix + ".attentions.0", dtype),
        "res1": _vae_res(sd, prefix + ".resnets.1", dtype),
    }


def vae_from_torch(sd: dict, dtype=jnp.bfloat16, num_res_blocks: int = 2,
                   num_stages: int = 4):
    """Convert a Qwen-Image VAE state dict to the 2D image-mode pytree.

    Encoder down_blocks is a flat ModuleList: per stage `num_res_blocks`
    residual blocks then (except the last stage) a downsample module
    (qwen_image_vae.py:387-400).  Decoder up_blocks is structured
    (qwen_image_vae.py:569-589).  Temporal `time_conv` weights of the 3D
    resample modules are intentionally dropped (dead in image mode).
    """
    enc_stages = []
    idx = 0
    for s in range(num_stages):
        stage = {"res": [
            _vae_res(sd, f"encoder.down_blocks.{idx + r}", dtype)
            for r in range(num_res_blocks)
        ]}
        idx += num_res_blocks
        if s != num_stages - 1:
            stage["down"] = _conv3d_tap(sd, f"encoder.down_blocks.{idx}.resample.1", dtype)
            idx += 1
        enc_stages.append(stage)

    dec_stages = []
    for s in range(num_stages):
        stage = {"res": [
            _vae_res(sd, f"decoder.up_blocks.{s}.resnets.{r}", dtype)
            for r in range(num_res_blocks + 1)
        ]}
        if f"decoder.up_blocks.{s}.upsamplers.0.resample.1.weight" in sd:
            stage["up"] = _conv3d_tap(sd, f"decoder.up_blocks.{s}.upsamplers.0.resample.1", dtype)
        dec_stages.append(stage)

    return {
        "encoder": {
            "conv_in": _conv3d_tap(sd, "encoder.conv_in", dtype),
            "stages": enc_stages,
            "mid": _vae_mid(sd, "encoder.mid_block", dtype),
            "norm_out": _vae_norm(sd, "encoder.norm_out", dtype),
            "conv_out": _conv3d_tap(sd, "encoder.conv_out", dtype),
        },
        "decoder": {
            "conv_in": _conv3d_tap(sd, "decoder.conv_in", dtype),
            "mid": _vae_mid(sd, "decoder.mid_block", dtype),
            "stages": dec_stages,
            "norm_out": _vae_norm(sd, "decoder.norm_out", dtype),
            "conv_out": _conv3d_tap(sd, "decoder.conv_out", dtype),
        },
        "quant_conv": _conv3d_tap(sd, "quant_conv", dtype),
        "post_quant_conv": _conv3d_tap(sd, "post_quant_conv", dtype),
    }


def _conv3d_full(sd, prefix, dtype):
    """Causal Conv3d keeping the FULL temporal kernel (video mode):
    torch [O, I, kT, kH, kW] -> DHWIO [kT, kH, kW, I, O]."""
    w = np.asarray(_t(sd, prefix + ".weight", jnp.float32))
    assert w.ndim == 5, (prefix, w.shape)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), dtype=dtype),
        "b": _t(sd, prefix + ".bias", dtype),
    }


def _vae_res_3d(sd, prefix, dtype):
    p = {
        "norm1": _vae_norm(sd, prefix + ".norm1", dtype),
        "conv1": _conv3d_full(sd, prefix + ".conv1", dtype),
        "norm2": _vae_norm(sd, prefix + ".norm2", dtype),
        "conv2": _conv3d_full(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".conv_shortcut.weight" in sd:
        p["shortcut"] = _conv3d_full(sd, prefix + ".conv_shortcut", dtype)
    return p


def _vae_mid_3d(sd, prefix, dtype):
    return {
        "res0": _vae_res_3d(sd, prefix + ".resnets.0", dtype),
        "attn": _vae_attn(sd, prefix + ".attentions.0", dtype),
        "res1": _vae_res_3d(sd, prefix + ".resnets.1", dtype),
    }


def vae_video_from_torch(sd: dict, dtype=jnp.bfloat16, num_res_blocks: int = 2,
                         num_stages: int = 4):
    """Video-mode pytree for models/vae3d.py: causal convs keep their full
    temporal kernels; spatial-only modules (attention, resample, 1x1x1
    quant convs) stay 2D per frame.  The reference's `time_conv` weights
    remain unused — the non-cache video path never applies them
    (qwen_image_vae.py:259-300; see models/vae3d.py docstring)."""
    enc_stages = []
    idx = 0
    for s in range(num_stages):
        stage = {"res": [
            _vae_res_3d(sd, f"encoder.down_blocks.{idx + r}", dtype)
            for r in range(num_res_blocks)
        ]}
        idx += num_res_blocks
        if s != num_stages - 1:
            stage["down"] = _conv3d_tap(sd, f"encoder.down_blocks.{idx}.resample.1", dtype)
            idx += 1
        enc_stages.append(stage)

    dec_stages = []
    for s in range(num_stages):
        stage = {"res": [
            _vae_res_3d(sd, f"decoder.up_blocks.{s}.resnets.{r}", dtype)
            for r in range(num_res_blocks + 1)
        ]}
        if f"decoder.up_blocks.{s}.upsamplers.0.resample.1.weight" in sd:
            stage["up"] = _conv3d_tap(sd, f"decoder.up_blocks.{s}.upsamplers.0.resample.1", dtype)
        dec_stages.append(stage)

    return {
        "encoder": {
            "conv_in": _conv3d_full(sd, "encoder.conv_in", dtype),
            "stages": enc_stages,
            "mid": _vae_mid_3d(sd, "encoder.mid_block", dtype),
            "norm_out": _vae_norm(sd, "encoder.norm_out", dtype),
            "conv_out": _conv3d_full(sd, "encoder.conv_out", dtype),
        },
        "decoder": {
            "conv_in": _conv3d_full(sd, "decoder.conv_in", dtype),
            "mid": _vae_mid_3d(sd, "decoder.mid_block", dtype),
            "stages": dec_stages,
            "norm_out": _vae_norm(sd, "decoder.norm_out", dtype),
            "conv_out": _conv3d_full(sd, "decoder.conv_out", dtype),
        },
        "quant_conv": _conv3d_tap(sd, "quant_conv", dtype),
        "post_quant_conv": _conv3d_tap(sd, "post_quant_conv", dtype),
    }


# ---------------------------------------------------------------------------
# Adapter converters (pipelines/helpers.py modules)
# ---------------------------------------------------------------------------

def _ln_p(sd, prefix, dtype):
    return {"scale": _t(sd, prefix + ".weight", dtype),
            "bias": _t(sd, prefix + ".bias", dtype)}


def perceiver_from_torch(sd: dict, prefix: str = "", dtype=jnp.float32):
    """PerceiverResampler state dict -> pytree (helpers.py:67-91 key space)."""
    pfx = prefix + "." if prefix and not prefix.endswith(".") else prefix
    depth = 1 + max(int(k[len(pfx) + 7:].split(".")[0])
                    for k in sd if k.startswith(pfx + "layers."))
    layers = []
    for i in range(depth):
        a = f"{pfx}layers.{i}.0"
        f = f"{pfx}layers.{i}.1"
        layers.append({
            "attn": {
                "norm_media": _ln_p(sd, a + ".norm_media", dtype),
                "norm_latents": _ln_p(sd, a + ".norm_latents", dtype),
                "to_q": {"w": _t(sd, a + ".to_q.weight", dtype).T},
                "to_kv": {"w": _t(sd, a + ".to_kv.weight", dtype).T},
                "to_out": {"w": _t(sd, a + ".to_out.weight", dtype).T},
            },
            "ff": {
                "norm": _ln_p(sd, f + ".net.0", dtype),
                "fc1": _lin(sd, f + ".net.1", dtype),
                "fc2": _lin(sd, f + ".net.3", dtype),
            },
        })
    return {
        "latents": _t(sd, pfx + "latents", dtype),
        "pos_emb": _t(sd, pfx + "pos_emb.weight", dtype),
        "layers": layers,
        "norm": _ln_p(sd, pfx + "norm", dtype),
    }


def visual_thinking_from_torch(sd: dict, prefix: str = "", dtype=jnp.float32):
    """VisualThinkingAdapter (net.0 / net.2 linears)."""
    pfx = prefix + "." if prefix and not prefix.endswith(".") else prefix
    return {"fc1": _lin(sd, pfx + "net.0", dtype), "fc2": _lin(sd, pfx + "net.2", dtype)}


def dual_adapter_from_torch(sd: dict, prefix: str = "", dtype=jnp.float32):
    """VisualThinkingDualAdapter (head_dino.0/2, head_vae.0/2)."""
    pfx = prefix + "." if prefix and not prefix.endswith(".") else prefix
    return {
        "head_dino": {"fc1": _lin(sd, pfx + "head_dino.0", dtype),
                      "fc2": _lin(sd, pfx + "head_dino.2", dtype)},
        "head_vae": {"fc1": _lin(sd, pfx + "head_vae.0", dtype),
                     "fc2": _lin(sd, pfx + "head_vae.2", dtype)},
    }


# ---------------------------------------------------------------------------
# DINOv2 converter (HF Dinov2WithRegistersModel key space)
# ---------------------------------------------------------------------------

def dinov2_from_torch(sd: dict, dtype=jnp.float32, num_layers: int | None = None):
    """HF Dinov2WithRegisters state dict -> pytree for models/dinov2.py."""
    if num_layers is None:
        num_layers = 1 + max(int(k.split(".")[2]) for k in sd
                             if k.startswith("encoder.layer."))

    def layer(i):
        p = f"encoder.layer.{i}"
        return {
            "norm1": _ln_p(sd, p + ".norm1", dtype),
            "qkv": _fused_qkv(sd, [p + ".attention.attention.query",
                                   p + ".attention.attention.key",
                                   p + ".attention.attention.value"], dtype),
            "out": _lin(sd, p + ".attention.output.dense", dtype),
            "ls1": _t(sd, p + ".layer_scale1.lambda1", dtype),
            "norm2": _ln_p(sd, p + ".norm2", dtype),
            "fc1": _lin(sd, p + ".mlp.fc1", dtype),
            "fc2": _lin(sd, p + ".mlp.fc2", dtype),
            "ls2": _t(sd, p + ".layer_scale2.lambda1", dtype),
        }

    import jax

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *[layer(i) for i in range(num_layers)])
    pw = np.asarray(_t(sd, "embeddings.patch_embeddings.projection.weight", jnp.float32))
    return {
        "cls_token": _t(sd, "embeddings.cls_token", dtype),
        "register_tokens": _t(sd, "embeddings.register_tokens", dtype),
        "pos_emb": _t(sd, "embeddings.position_embeddings", dtype),
        "patch_embed": {
            "w": jnp.asarray(np.transpose(pw, (2, 3, 1, 0)), dtype=dtype),
            "b": _t(sd, "embeddings.patch_embeddings.projection.bias", dtype),
        },
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Qwen2.5-VL converters (HF Qwen2_5_VLForConditionalGeneration key space,
# after the reference's remap visual.* -> model.visual.*, model.* ->
# model.language_model.*  — qwen_image_text_encoder_withdecode.py:287-296)
# ---------------------------------------------------------------------------

def _detect_prefix(sd: dict, candidates, probe: str) -> str:
    """First candidate prefix under which `probe` exists.

    HF checkpoints of Qwen2.5-VL exist in two key spaces — the remapped
    one the reference produces (model.language_model.*, model.visual.*,
    qwen_image_text_encoder_withdecode.py:287-296) and the pre-remap HF
    save_pretrained layout (model.*, visual.*) — accept both."""
    for c in candidates:
        if any(k.startswith(c + probe) for k in sd):
            return c
    raise KeyError(f"none of {candidates} + {probe!r} found in checkpoint "
                   f"(sample keys: {sorted(sd)[:5]})")


def qwen_vl_text_from_torch(sd: dict, dtype=jnp.bfloat16,
                            num_layers: int | None = None):
    """Text decoder + lm_head -> pytree for models/qwen_vl.py."""
    base = _detect_prefix(sd, ("model.language_model.", "model."),
                          "layers.0.self_attn.q_proj.weight")
    if num_layers is None:
        num_layers = 1 + max(int(k[len(base) + 7:].split(".")[0])
                             for k in sd if k.startswith(base + "layers."))

    def layer(i):
        p = f"{base}layers.{i}"
        return {
            "ln1": {"scale": _t(sd, p + ".input_layernorm.weight", dtype)},
            "q": _lin(sd, p + ".self_attn.q_proj", dtype),
            "k": _lin(sd, p + ".self_attn.k_proj", dtype),
            "v": _lin(sd, p + ".self_attn.v_proj", dtype),
            "o": _lin(sd, p + ".self_attn.o_proj", dtype),
            "ln2": {"scale": _t(sd, p + ".post_attention_layernorm.weight", dtype)},
            "mlp": {
                "gate": _lin(sd, p + ".mlp.gate_proj", dtype),
                "up": _lin(sd, p + ".mlp.up_proj", dtype),
                "down": _lin(sd, p + ".mlp.down_proj", dtype),
            },
        }

    import jax

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *[layer(i) for i in range(num_layers)])
    return {
        "embed": _t(sd, base + "embed_tokens.weight", dtype),
        "layers": layers,
        "norm": {"scale": _t(sd, base + "norm.weight", dtype)},
        "lm_head": _lin(sd, "lm_head", dtype),
    }


def qwen_vl_vision_from_torch(sd: dict, dtype=jnp.bfloat16,
                              num_layers: int | None = None):
    """Vision tower + merger -> pytree for models/qwen_vl_vision.py."""
    base = _detect_prefix(sd, ("model.visual.", "visual."),
                          "blocks.0.attn.qkv.weight")
    if num_layers is None:
        num_layers = 1 + max(int(k[len(base) + 7:].split(".")[0])
                             for k in sd if k.startswith(base + "blocks."))

    def block(i):
        p = f"{base}blocks.{i}"
        return {
            "norm1": {"scale": _t(sd, p + ".norm1.weight", dtype)},
            "qkv": _lin(sd, p + ".attn.qkv", dtype),
            "proj": _lin(sd, p + ".attn.proj", dtype),
            "norm2": {"scale": _t(sd, p + ".norm2.weight", dtype)},
            "mlp": {
                "gate": _lin(sd, p + ".mlp.gate_proj", dtype),
                "up": _lin(sd, p + ".mlp.up_proj", dtype),
                "down": _lin(sd, p + ".mlp.down_proj", dtype),
            },
        }

    import jax

    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *[block(i) for i in range(num_layers)])
    # patch_embed.proj: Conv3d [hidden, 3, T=2, 14, 14] applied to flattened
    # patches -> store as a dense matrix [3*2*14*14, hidden].
    pw = np.asarray(_t(sd, base + "patch_embed.proj.weight", jnp.float32))
    flat = pw.reshape(pw.shape[0], -1).T
    return {
        "patch_embed": {"w": jnp.asarray(flat, dtype=dtype)},
        "blocks": blocks,
        "merger": {
            "ln_q": {"scale": _t(sd, base + "merger.ln_q.weight", dtype)},
            "fc1": _lin(sd, base + "merger.mlp.0", dtype),
            "fc2": _lin(sd, base + "merger.mlp.2", dtype),
        },
    }


def physic_adapters_from_state_dict(pipe_sd: dict, dtype=jnp.float32) -> dict:
    """Pipeline-level adapter weights (the `pipe.*` half of a finetuned
    PhysicEdit checkpoint, validate.py:55-65) -> pytrees.

    Missing groups are simply absent from the result (e.g. an
    inference-only checkpoint without the train-time resamplers).
    """
    out = {}
    if any(k.startswith("visual_thinking_adapter.") for k in pipe_sd):
        out["visual_thinking_adapter"] = dual_adapter_from_torch(
            pipe_sd, "visual_thinking_adapter", dtype)
    for name in ("dino_resampler", "vae_resampler"):
        if any(k.startswith(name + ".") for k in pipe_sd):
            out[name] = perceiver_from_torch(pipe_sd, name, dtype)
        if any(k.startswith(name + "_adapter.") for k in pipe_sd):
            out[name + "_adapter"] = visual_thinking_from_torch(
                pipe_sd, name + "_adapter", dtype)
    for name in ("dino_time_embed", "vae_time_embed"):
        if name + ".weight" in pipe_sd:
            out[name] = _t(pipe_sd, name + ".weight", dtype)
    return out


# ---------------------------------------------------------------------------
# Config inference (size-robust loading: the reference instantiates network
# classes with hard-coded constants, model_manager.py:11-34; here the same
# checkpoint-driven loading works for any width/depth — tiny test models
# and the production Qwen-Image-Edit weights alike)
# ---------------------------------------------------------------------------

def dit_config_from_params(params) -> "object":
    """DiTConfig derived from a converted DiT pytree's shapes (exactly
    reproduces QWEN_IMAGE_CONFIG on the real checkpoint)."""
    import dataclasses

    from physicedit_tpu.models.dit import QWEN_IMAGE_CONFIG

    blocks = params["blocks"]
    head_dim = int(blocks["attn"]["norm_q"]["scale"].shape[-1])
    dim = int(params["img_in"]["w"].shape[1])
    return dataclasses.replace(
        QWEN_IMAGE_CONFIG,
        num_layers=int(blocks["img_mod"]["w"].shape[0]),
        dim=dim,
        num_heads=dim // head_dim,
        head_dim=head_dim,
        txt_in_dim=int(params["txt_norm"]["scale"].shape[0]),
        patch_dim=int(params["img_in"]["w"].shape[0]),
        time_dim=int(params["time_embed"]["linear_1"]["w"].shape[0]))


def vae_config_from_params(params) -> "object":
    """VAEConfig (base_dim, z_dim) from a converted VAE pytree."""
    import dataclasses

    from physicedit_tpu.models.vae import QWEN_VAE_CONFIG

    return dataclasses.replace(
        QWEN_VAE_CONFIG,
        base_dim=int(params["encoder"]["conv_in"]["w"].shape[-1]),
        z_dim=int(params["quant_conv"]["w"].shape[-1]) // 2)


def dinov2_config_from_hf(hf: dict, params=None) -> "object":
    """DinoV2Config from an HF Dinov2WithRegisters config.json dict,
    optionally filling num_layers from a converted pytree."""
    import dataclasses

    from physicedit_tpu.models.dinov2 import DINOV2_BASE

    cfg = dataclasses.replace(
        DINOV2_BASE,
        hidden_size=int(hf.get("hidden_size", DINOV2_BASE.hidden_size)),
        num_layers=int(hf.get("num_hidden_layers", DINOV2_BASE.num_layers)),
        num_heads=int(hf.get("num_attention_heads", DINOV2_BASE.num_heads)),
        mlp_ratio=int(hf.get("mlp_ratio", DINOV2_BASE.mlp_ratio)),
        patch_size=int(hf.get("patch_size", DINOV2_BASE.patch_size)),
        num_register_tokens=int(hf.get("num_register_tokens",
                                       DINOV2_BASE.num_register_tokens)),
        eps=float(hf.get("layer_norm_eps", DINOV2_BASE.eps)))
    if params is not None:
        cfg = dataclasses.replace(
            cfg, num_layers=int(params["layers"]["fc1"]["w"].shape[0]))
    return cfg


def text_config_from_hf(hf: dict) -> "object":
    """QwenVLTextConfig from an HF Qwen2_5_VL config.json dict (the file
    shipped next to every text-encoder checkpoint)."""
    import dataclasses

    from physicedit_tpu.models.qwen_vl import QWEN25_VL_7B_TEXT

    heads = int(hf["num_attention_heads"])
    hidden = int(hf["hidden_size"])
    sec = hf.get("rope_scaling", {}).get("mrope_section") or \
        list(QWEN25_VL_7B_TEXT.mrope_section)
    return dataclasses.replace(
        QWEN25_VL_7B_TEXT,
        hidden_size=hidden,
        num_layers=int(hf["num_hidden_layers"]),
        num_heads=heads,
        num_kv_heads=int(hf.get("num_key_value_heads", heads)),
        head_dim=int(hf.get("head_dim", hidden // heads)),
        intermediate_size=int(hf["intermediate_size"]),
        vocab_size=int(hf["vocab_size"]),
        rope_theta=float(hf.get("rope_theta", 1e6)),
        mrope_section=tuple(sec),
        eps=float(hf.get("rms_norm_eps", 1e-6)),
        image_token_id=int(hf.get("image_token_id", 151655)),
        video_token_id=int(hf.get("video_token_id", 151656)),
        vision_start_token_id=int(hf.get("vision_start_token_id", 151652)),
        eos_token_id=int(hf.get("eos_token_id", 151645)))


def vision_config_from_hf(hf: dict) -> "object":
    """QwenVLVisionConfig from the vision_config block of config.json."""
    import dataclasses

    from physicedit_tpu.models.qwen_vl_vision import QWEN25_VL_VISION

    v = hf.get("vision_config", hf)
    base = QWEN25_VL_VISION
    return dataclasses.replace(
        base,
        depth=int(v.get("depth", base.depth)),
        hidden_size=int(v.get("hidden_size", base.hidden_size)),
        num_heads=int(v.get("num_heads", base.num_heads)),
        intermediate_size=int(v.get("intermediate_size",
                                    base.intermediate_size)),
        patch_size=int(v.get("patch_size", base.patch_size)),
        temporal_patch_size=int(v.get("temporal_patch_size",
                                      base.temporal_patch_size)),
        spatial_merge_size=int(v.get("spatial_merge_size",
                                     base.spatial_merge_size)),
        window_size=int(v.get("window_size", base.window_size)),
        fullatt_block_indexes=tuple(v.get("fullatt_block_indexes",
                                          base.fullatt_block_indexes)),
        out_hidden_size=int(v.get("out_hidden_size", base.out_hidden_size)))
