"""Materialise a synthetic "real-layout" checkpoint tree for every model
family PhysicEdit loads — the real-weight readiness rehearsal.

The tree mirrors the HF/ModelScope folder layout of the real checkpoints
(Qwen/Qwen-Image-Edit-2509 + facebook/dinov2-with-registers-base):

    <out>/
      transformer/
        diffusion_pytorch_model-00001-of-00002.safetensors
        diffusion_pytorch_model-00002-of-00002.safetensors
        diffusion_pytorch_model.safetensors.index.json
      text_encoder/
        model-00001-of-00002.safetensors
        model-00002-of-00002.safetensors
        model.safetensors.index.json
        config.json
      vae/diffusion_pytorch_model.safetensors
      tokenizer/                      (placeholder; see docs/REAL_WEIGHTS.md)
      dinov2/
        model.safetensors
        config.json

Weights are TINY (the key SPACES are exact — every converter row in
io/convert.py is exercised — but the dims are small), generated from the
reference's own torch modules (DiT blocks, VAE) and HF's Qwen2.5-VL /
Dinov2WithRegisters classes, so any drift between our key-map tables and
the real checkpoints' key spaces fails loudly here instead of on the day
real weights arrive.  `--layers/--dim` control the DiT size.

Usage: python tools/make_synthetic_checkpoint.py --out /tmp/synth_ckpt
Then:  python -m physicedit_tpu.cli.validate --base_model_path /tmp/synth_ckpt ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE = os.environ.get("PHYSICEDIT_REFERENCE", "/root/reference")


def _load_ref_module(dotted: str):
    """Import a module from the reference DiffSynth fork (for the exact
    torch key spaces of the DiT blocks and the VAE).  A synthetic package
    avoids the fork's heavy __init__ side-effects; relative imports inside
    the loaded file resolve via the package __path__ (same trick as
    tests/conftest.py)."""
    import importlib
    import types

    root = os.path.join(REFERENCE, "DiffSynth-Studio", "diffsynth")
    if not os.path.isdir(root):
        raise SystemExit(
            f"reference tree not found at {root}; set PHYSICEDIT_REFERENCE")
    if "refsynth" not in sys.modules:
        for name, path in [("refsynth", root),
                           ("refsynth.models", os.path.join(root, "models")),
                           ("refsynth.pipelines",
                            os.path.join(root, "pipelines")),
                           ("refsynth.schedulers",
                            os.path.join(root, "schedulers"))]:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    return importlib.import_module(f"refsynth.{dotted}")


def _np(t):
    return t.detach().float().numpy()


def _save_sharded(sd: dict, folder: str, stem: str, n_shards: int = 2):
    """Write a sharded safetensors set + the HF .index.json weight map."""
    from safetensors.numpy import save_file

    os.makedirs(folder, exist_ok=True)
    keys = sorted(sd)
    per = (len(keys) + n_shards - 1) // n_shards
    weight_map = {}
    total = 0
    for i in range(n_shards):
        shard_keys = keys[i * per:(i + 1) * per]
        fname = f"{stem}-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file({k: sd[k] for k in shard_keys}, os.path.join(folder, fname))
        for k in shard_keys:
            weight_map[k] = fname
            total += sd[k].nbytes
    with open(os.path.join(folder, f"{stem}.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=1)


def build_dit(out: str, num_layers: int = 3, dim: int = 256):
    import torch

    torch.manual_seed(0)
    ref_dit = _load_ref_module("models.qwen_image_dit")
    sd = {}
    for i in range(num_layers):
        blk = ref_dit.QwenImageTransformerBlock(
            dim=dim, num_attention_heads=dim // 128,
            attention_head_dim=128).eval()
        for k, v in blk.state_dict().items():
            sd[f"transformer_blocks.{i}.{k}"] = _np(v)
    rng = np.random.default_rng(0)

    def lin(out_d, in_d):
        return (rng.normal(size=(out_d, in_d)).astype(np.float32) * 0.02,
                rng.normal(size=(out_d,)).astype(np.float32) * 0.01)

    for name, (out_d, in_d) in {
        "img_in": (dim, 64), "txt_in": (dim, 64),
        "time_text_embed.timestep_embedder.linear_1": (dim, 256),
        "time_text_embed.timestep_embedder.linear_2": (dim, dim),
        "norm_out.linear": (2 * dim, dim), "proj_out": (64, dim),
    }.items():
        w, b = lin(out_d, in_d)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b
    sd["txt_norm.weight"] = np.ones((64,), np.float32)
    _save_sharded(sd, os.path.join(out, "transformer"),
                  "diffusion_pytorch_model")


def build_vae(out: str):
    import torch
    from safetensors.numpy import save_file

    torch.manual_seed(1)
    ref_vae = _load_ref_module("models.qwen_image_vae")
    vae = ref_vae.QwenImageVAE(base_dim=8).eval()
    os.makedirs(os.path.join(out, "vae"), exist_ok=True)
    save_file({k: _np(v) for k, v in vae.state_dict().items()},
              os.path.join(out, "vae", "diffusion_pytorch_model.safetensors"))


def build_text_encoder(out: str):
    """Tiny HF Qwen2.5-VL in the REFERENCE checkpoint key space
    (visual.* / model.*; the reference remaps to model.visual.* /
    model.language_model.* at load — withdecode.py:283-296), sharded."""
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    torch.manual_seed(2)
    cfg = Qwen2_5_VLConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        rope_scaling={"mrope_section": [4, 2, 2], "rope_type": "default",
                      "type": "default"},
        rope_theta=1e6, tie_word_embeddings=False, rms_norm_eps=1e-6,
        bos_token_id=1, eos_token_id=2,
        image_token_id=99, video_token_id=100,
        vision_start_token_id=98, vision_end_token_id=97,
        vision_config={"depth": 2, "hidden_size": 32, "num_heads": 2,
                       "intermediate_size": 64, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 2,
                       "out_hidden_size": 64, "fullatt_block_indexes": [1],
                       "window_size": 56, "in_channels": 3,
                       "tokens_per_second": 2},
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    tsd = {}
    for k, v in model.state_dict().items():
        if k.startswith("model.visual."):
            k = k[len("model."):]
        elif k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        tsd[k] = _np(v)
    folder = os.path.join(out, "text_encoder")
    _save_sharded(tsd, folder, "model")
    with open(os.path.join(folder, "config.json"), "w") as f:
        json.dump(model.config.to_dict(), f)
    os.makedirs(os.path.join(out, "tokenizer"), exist_ok=True)


def build_dinov2(out: str):
    """Tiny HF Dinov2WithRegisters (exact key space of
    facebook/dinov2-with-registers-base) + its config.json."""
    import torch
    from safetensors.numpy import save_file

    try:
        from transformers import (Dinov2WithRegistersConfig,
                                  Dinov2WithRegistersModel)
    except ImportError:  # older transformers
        print("[synth] transformers lacks Dinov2WithRegisters; skipping "
              "dinov2 (upgrade transformers on the real-weights machine)")
        return
    torch.manual_seed(3)
    cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=4, patch_size=14, num_register_tokens=4, image_size=518)
    model = Dinov2WithRegistersModel(cfg).eval()
    folder = os.path.join(out, "dinov2")
    os.makedirs(folder, exist_ok=True)
    save_file({k: _np(v) for k, v in model.state_dict().items()},
              os.path.join(folder, "model.safetensors"))
    with open(os.path.join(folder, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f)


# The reference's 12 LoRA target module types (train_multigpu.sh:30) as
# they appear inside each transformer block's key space.
LORA_TARGETS = (
    "attn.to_q", "attn.to_k", "attn.to_v",
    "attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj",
    "attn.to_out.0", "attn.to_add_out",
    "img_mlp.net.2", "txt_mlp.net.2", "img_mod.1", "txt_mod.1",
)


def build_finetuned(out: str, rank: int = 4, text_hidden: int = 64,
                    dino_hidden: int = 64, vae_patch_dim: int = 64):
    """`physicedit_checkpoint.safetensors` in the EXACT published format
    (train_physicedit.py:180-184 export with --remove_prefix_in_ckpt
    "pipe.dit.", loaded by validate.py:33-65):

    - DiT LoRA: `transformer_blocks.{i}.{module}.lora_{A,B}.default.weight`
      (peft naming, `pipe.dit.` prefix stripped at save) for all 12 target
      module types, rank `rank`, shapes read back from the synthetic
      transformer shards so the key-map AND dims stay in lockstep;
    - adapters: `pipe.{name}.{k}` state dicts generated from the
      REFERENCE's own torch modules (pipelines/helpers.py) at the
      synthetic tree's dims (qwen_image_physical.py:206-224 instantiation).
    """
    import torch
    from safetensors.numpy import save_file
    from physicedit_tpu.io.safetensors_io import load_state_dict

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    helpers = _load_ref_module("pipelines.helpers")

    dit_sd = load_state_dict(os.path.join(out, "transformer"))
    n_layers = 1 + max(int(k.split(".")[1]) for k in dit_sd
                       if k.startswith("transformer_blocks."))
    sd = {}
    for i in range(n_layers):
        for mod in LORA_TARGETS:
            w = dit_sd[f"transformer_blocks.{i}.{mod}.weight"]
            out_d, in_d = w.shape
            sd[f"transformer_blocks.{i}.{mod}.lora_A.default.weight"] = (
                rng.normal(size=(rank, in_d)).astype(np.float32) * 0.02)
            sd[f"transformer_blocks.{i}.{mod}.lora_B.default.weight"] = (
                rng.normal(size=(out_d, rank)).astype(np.float32) * 0.02)

    def put(name, module):
        for k, v in module.state_dict().items():
            sd[f"pipe.{name}.{k}"] = _np(v)

    put("visual_thinking_adapter", helpers.VisualThinkingDualAdapter(
        in_dim=text_hidden, out_dim=text_hidden, t_min=20.0, t_max=1000.0))
    put("dino_resampler", helpers.PerceiverResampler(
        dim=dino_hidden, num_latents=8, depth=2))
    put("dino_resampler_adapter", helpers.VisualThinkingAdapter(
        in_dim=dino_hidden, out_dim=text_hidden))
    put("dino_time_embed", torch.nn.Embedding(6, dino_hidden))
    put("vae_resampler", helpers.PerceiverResampler(
        dim=vae_patch_dim, num_latents=8, depth=2, max_num_media_tokens=256))
    put("vae_resampler_adapter", helpers.VisualThinkingAdapter(
        in_dim=vae_patch_dim, out_dim=text_hidden))
    put("vae_time_embed", torch.nn.Embedding(6, vae_patch_dim))

    path = os.path.join(out, "physicedit_checkpoint.safetensors")
    save_file(sd, path)
    return path


def build_all(out: str, num_layers: int = 3, dim: int = 256):
    os.makedirs(out, exist_ok=True)
    build_dit(out, num_layers, dim)
    build_vae(out)
    build_text_encoder(out)
    build_dinov2(out)
    build_finetuned(out)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()
    build_all(args.out, args.layers, args.dim)
    print(f"[synth] wrote synthetic checkpoint tree to {args.out}")
