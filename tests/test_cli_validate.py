"""CLI integration: cli/validate.py end-to-end from CHECKPOINT FILES.

Builds a tiny Qwen-Image-Edit-style model folder on disk in the REFERENCE
key space (transformer / text_encoder+config.json / vae), then drives the
validate CLI through file discovery, hash/heuristic model detection, the
torch-key converters, size-robust config inference, the full denoise and
the image save — the complete validate.py:67-139 path on real files.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import load_ref_module, requires_reference


def _np(t):
    return t.detach().float().numpy()


def _build_model_dir(base):
    import torch
    from safetensors.numpy import save_file

    torch.manual_seed(0)

    # --- DiT: 2 reference blocks (dim 256, head_dim 128 so the default
    # rope_axes (16,56,56) apply) + hand-made top-level projections -------
    ref_dit = load_ref_module("models.qwen_image_dit")
    sd = {}
    for i in range(2):
        blk = ref_dit.QwenImageTransformerBlock(
            dim=256, num_attention_heads=2, attention_head_dim=128).eval()
        for k, v in blk.state_dict().items():
            sd[f"transformer_blocks.{i}.{k}"] = _np(v)
    rng = np.random.default_rng(0)

    def lin(out_d, in_d):
        return (rng.normal(size=(out_d, in_d)).astype(np.float32) * 0.02,
                rng.normal(size=(out_d,)).astype(np.float32) * 0.01)

    for name, (out_d, in_d) in {
        "img_in": (256, 64), "txt_in": (256, 64),
        "time_text_embed.timestep_embedder.linear_1": (256, 256),
        "time_text_embed.timestep_embedder.linear_2": (256, 256),
        "norm_out.linear": (512, 256), "proj_out": (64, 256),
    }.items():
        w, b = lin(out_d, in_d)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b
    sd["txt_norm.weight"] = np.ones((64,), np.float32)
    os.makedirs(os.path.join(base, "transformer"))
    save_file(sd, os.path.join(base, "transformer",
                               "diffusion_pytorch_model.safetensors"))

    # --- VAE: tiny reference module ------------------------------------
    ref_vae = load_ref_module("models.qwen_image_vae")
    vae = ref_vae.QwenImageVAE(base_dim=8).eval()
    os.makedirs(os.path.join(base, "vae"))
    save_file({k: _np(v) for k, v in vae.state_dict().items()},
              os.path.join(base, "vae", "diffusion_pytorch_model.safetensors"))

    # --- Text encoder: tiny HF model, saved in the REFERENCE checkpoint
    # key space (visual.* / model.*), plus its config.json ----------------
    from tests.test_qwen_vl import _tiny_hf

    model, _, _ = _tiny_hf(0)
    tsd = {}
    for k, v in model.state_dict().items():
        if k.startswith("model.visual."):
            k = k[len("model."):]
        elif k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        tsd[k] = _np(v)
    os.makedirs(os.path.join(base, "text_encoder"))
    save_file(tsd, os.path.join(base, "text_encoder", "model.safetensors"))
    with open(os.path.join(base, "text_encoder", "config.json"), "w") as f:
        json.dump(model.config.to_dict(), f)
    os.makedirs(os.path.join(base, "tokenizer"))  # triggers load_tokenizer


@requires_reference
@pytest.mark.slow
def test_validate_cli_end_to_end(tmp_path, monkeypatch):
    import physicedit_tpu.cli.validate as cli
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from tests.test_pipeline_e2e import FakeTokenizer

    base = str(tmp_path / "models")
    os.makedirs(base)
    _build_model_dir(base)

    # tiny stand-ins for the two host-side full-size dependencies: the HF
    # tokenizer files and the 1024^2 resize
    def fake_load_tokenizer(self, path):
        self.tokenizer = FakeTokenizer()
        self.boi_token_id = 96
        self.eoi_token_id = 95
        self.edit_drop_idx = 2
        self.t2i_drop_idx = 2

    monkeypatch.setattr(PhysicEditPipeline, "load_tokenizer",
                        fake_load_tokenizer)
    monkeypatch.setattr(cli, "resize_image",
                        lambda im, target_area=0: im.resize((64, 64)))

    rng = np.random.default_rng(1)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
                    ).save(in_path)
    out_path = str(tmp_path / "out" / "edited.png")

    cli.main([
        "--prompt", "the ball rolls off the table",
        "--image_path", in_path,
        "--save_path", out_path,
        "--base_model_path", base,
        "--seed", "3",
        "--num_inference_steps", "2",
        "--no_text_reasoning",
    ])

    assert os.path.exists(out_path)
    out = np.asarray(Image.open(out_path))
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all() and out.std() > 0


@requires_reference
def test_from_pretrained_infers_tiny_configs(tmp_path):
    """Size-robust loading: configs come from checkpoint shapes and
    config.json, not the hard-coded 20B/7B constants."""
    import glob

    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline

    base = str(tmp_path / "models")
    os.makedirs(base)
    _build_model_dir(base)
    paths = sorted(glob.glob(os.path.join(base, "**/*.safetensors"),
                             recursive=True))
    pipe = PhysicEditPipeline.from_pretrained(paths)
    assert (pipe.dit_cfg.num_layers, pipe.dit_cfg.dim,
            pipe.dit_cfg.num_heads, pipe.dit_cfg.head_dim) == (2, 256, 2, 128)
    assert pipe.dit_cfg.txt_in_dim == 64
    assert pipe.vae_cfg.base_dim == 8 and pipe.vae_cfg.z_dim == 16
    assert pipe.text_cfg.hidden_size == 64 and pipe.text_cfg.num_layers == 2
    assert pipe.text_cfg.num_kv_heads == 2 and pipe.text_cfg.head_dim == 16
    assert pipe.vision_cfg.depth == 2 and pipe.vision_cfg.out_hidden_size == 64
    assert pipe.image_pad_id == 99 and pipe.vision_start_id == 98


@requires_reference
def test_from_pretrained_by_preset_name(tmp_path, monkeypatch):
    """By-name loading (reference validate.py:94-125 rows as presets):
    `from_pretrained(model_id="Qwen/Qwen-Image-Edit-2509")` resolves the
    transformer / text-encoder / VAE / tokenizer through
    io.model_config.QWEN_IMAGE_PRESETS against a local hub-layout tree
    (skip_download: the hub gate stays closed)."""
    import shutil

    from physicedit_tpu.io.model_config import qwen_image_preset
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from tests.test_pipeline_e2e import FakeTokenizer

    local = str(tmp_path / "hub")
    qi = os.path.join(local, "Qwen", "Qwen-Image")
    os.makedirs(qi)
    _build_model_dir(qi)
    # the Edit-2509 repo carries only the transformer
    edit = os.path.join(local, "Qwen", "Qwen-Image-Edit-2509")
    os.makedirs(edit)
    shutil.copytree(os.path.join(qi, "transformer"),
                    os.path.join(edit, "transformer"))

    seen = {}

    def fake_load_tokenizer(self, path):
        seen["tokenizer_path"] = path
        self.tokenizer = FakeTokenizer()
        self.boi_token_id, self.eoi_token_id = 96, 95
        self.edit_drop_idx = self.t2i_drop_idx = 2

    monkeypatch.setattr(PhysicEditPipeline, "load_tokenizer",
                        fake_load_tokenizer)
    pipe = PhysicEditPipeline.from_pretrained(
        model_id="Qwen/Qwen-Image-Edit-2509", local_model_path=local,
        skip_download=True)
    assert pipe.dit_cfg.num_layers == 2 and pipe.dit_cfg.dim == 256
    assert pipe.vae_cfg.base_dim == 8
    assert pipe.text_cfg.num_layers == 2
    assert seen["tokenizer_path"].rstrip("/").endswith(
        os.path.join("Qwen", "Qwen-Image", "tokenizer"))

    # unknown names fail loudly with the known presets listed
    with pytest.raises(KeyError, match="Qwen-Image-Edit-2509"):
        qwen_image_preset("Qwen/No-Such-Model")
    # a missing local tree with the hub gate closed is a clean error
    with pytest.raises(FileNotFoundError):
        PhysicEditPipeline.from_pretrained(
            model_id="Qwen/Qwen-Image", local_model_path=str(tmp_path / "x"),
            skip_download=True)
    # neither paths nor a preset name is a usage error
    with pytest.raises(ValueError, match="model_id"):
        PhysicEditPipeline.from_pretrained()


@requires_reference
@pytest.mark.slow
def test_from_pretrained_int4_quantized_tiny(tmp_path, monkeypatch):
    """The single-chip serving load path: packed-int4 DiT + VL with fused
    decode projections, straight from disk files, runs an edit.  (The
    256-dim DiT is large enough to hit the real Pallas W4A8 kernel —
    interpret mode on the CPU test backend.)"""
    import functools
    import glob

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))

    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from tests.test_pipeline_e2e import FakeTokenizer

    base = str(tmp_path / "models")
    os.makedirs(base)
    _build_model_dir(base)
    paths = sorted(glob.glob(os.path.join(base, "**/*.safetensors"),
                             recursive=True))
    pipe = PhysicEditPipeline.from_pretrained(paths, quantize="int4")
    # the int4 serving load path ships the split-layer (unrolled) layout:
    # a tuple of per-layer trees, each with fused decode projections
    split = pipe.text_params["layers"]
    assert isinstance(split, tuple) and len(split) == pipe.text_cfg.num_layers
    layers = split[0]
    assert "qkv" in layers and "gate_up" in layers["mlp"]  # fused GEMVs
    # tiny VL leaves sit below the quantize size threshold (float fuse);
    # the DiT projections are large enough to get the packed-int4 layout
    assert "w" in layers["qkv"] or "w4" in layers["qkv"]
    assert "w4" in pipe.dit_params["blocks"]["attn"]["img_qkv"]

    pipe.tokenizer = FakeTokenizer()
    pipe.boi_token_id, pipe.eoi_token_id = 96, 95
    pipe.edit_drop_idx = pipe.t2i_drop_idx = 2
    rng = np.random.default_rng(2)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out = pipe("tilt the lamp", edit_image=edit, height=64, width=64, seed=1,
               num_inference_steps=1, have_text_reasoning=False,
               edit_image_auto_resize=False)
    assert out.size == (64, 64)
    assert np.isfinite(np.asarray(out)).all()


@requires_reference
@pytest.mark.slow
def test_synthetic_real_layout_tree_end_to_end(tmp_path, monkeypatch):
    """Real-weight readiness rehearsal (docs/REAL_WEIGHTS.md): the
    SHARDED HF-layout tree from tools/make_synthetic_checkpoint.py —
    index.json weight maps, reference key spaces for all four families —
    drives cli/validate.py end to end, and the DINOv2 folder loads through
    io/convert.dinov2_from_torch.  Catches key-map/config drift that
    single-file tiny trees cannot."""
    from tools.make_synthetic_checkpoint import build_all

    import physicedit_tpu.cli.validate as cli
    from physicedit_tpu.io.convert import dinov2_from_torch
    from physicedit_tpu.io.safetensors_io import load_state_dict
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from tests.test_pipeline_e2e import FakeTokenizer

    base = str(tmp_path / "synth")
    build_all(base, num_layers=3, dim=256)

    # the sharded transformer really is sharded
    assert os.path.exists(os.path.join(
        base, "transformer",
        "diffusion_pytorch_model-00002-of-00002.safetensors"))

    def fake_load_tokenizer(self, path):
        self.tokenizer = FakeTokenizer()
        self.boi_token_id = 96
        self.eoi_token_id = 95
        self.edit_drop_idx = 2
        self.t2i_drop_idx = 2

    monkeypatch.setattr(PhysicEditPipeline, "load_tokenizer",
                        fake_load_tokenizer)
    monkeypatch.setattr(cli, "resize_image",
                        lambda im, target_area=0: im.resize((64, 64)))

    rng = np.random.default_rng(4)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)
                    ).save(in_path)
    out_path = str(tmp_path / "out" / "edited.png")
    cli.main([
        "--prompt", "the glass tips over and spills",
        "--image_path", in_path,
        "--save_path", out_path,
        "--base_model_path", base,
        "--lora_path", os.path.join(base, "physicedit_checkpoint.safetensors"),
        "--seed", "7",
        "--num_inference_steps", "2",
        "--no_text_reasoning",
    ])
    out = np.asarray(Image.open(out_path))
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()

    # the finetuned checkpoint (published format: stripped-prefix peft
    # LoRA keys + pipe.* adapter keys, validate.py:33-65) really loads:
    # every adapter group lands, and the LoRA delta changes the DiT
    import jax

    paths = [os.path.join(base, "transformer"),
             os.path.join(base, "text_encoder"),
             os.path.join(base, "vae")]
    ft_path = os.path.join(base, "physicedit_checkpoint.safetensors")
    pipe_ft = PhysicEditPipeline.from_pretrained(
        paths, finetuned_path=ft_path)
    assert set(pipe_ft.adapters) == {
        "visual_thinking_adapter", "dino_resampler", "dino_resampler_adapter",
        "dino_time_embed", "vae_resampler", "vae_resampler_adapter",
        "vae_time_embed"}
    pipe_base = PhysicEditPipeline.from_pretrained(paths)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        pipe_ft.dit_params, pipe_base.dit_params)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0  # LoRA merge landed

    # DINOv2 family: HF key space loads through the converter (3-layer
    # inference from the stacked tree) and runs
    dino_sd = load_state_dict(os.path.join(base, "dinov2",
                                           "model.safetensors"))
    dparams = dinov2_from_torch(dino_sd)
    assert dparams["layers"]["qkv"]["w"].shape[0] == 2  # num layers stacked

    import json as _json

    import jax.numpy as jnp

    from physicedit_tpu.models import dinov2 as m_dino

    with open(os.path.join(base, "dinov2", "config.json")) as f:
        hf = _json.load(f)
    cfg = m_dino.DinoV2Config(
        hidden_size=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"], mlp_ratio=hf["mlp_ratio"],
        patch_size=hf["patch_size"],
        num_register_tokens=hf["num_register_tokens"])
    feats = m_dino.dinov2_features(
        dparams, cfg, jnp.zeros((1, 56, 56, 3), jnp.float32))
    assert feats.shape == (1, 16, hf["hidden_size"])


@requires_reference
@pytest.mark.slow
def test_golden_capture_round_trip(tmp_path):
    """VERDICT-r4 #7: the real-weight runbook's two commands, rehearsed
    end to end on a synthetic full-layout tree — capture loads the
    reference torch/HF models and writes the per-layer cascade (DiT block
    taps, VL hidden-state ladder + M-RoPE positions + vision tower, VAE
    round trip, DINOv2 wrapper features); compare replays every captured
    input through physicedit_tpu's converters and GATES on rel-L2.  At
    fp32 both sides agree to ~1e-6, so the 0.01 gate catching anything
    means a conversion bug, not noise."""
    from tools.capture_goldens import main as goldens_main
    from tools.make_synthetic_checkpoint import build_all

    base = str(tmp_path / "synth")
    build_all(base, num_layers=2, dim=256)
    goldens = str(tmp_path / "goldens.npz")
    model_args = [
        "--vae_path", os.path.join(base, "vae",
                                   "diffusion_pytorch_model.safetensors"),
        "--dit_path", os.path.join(base, "transformer"),
        "--text_encoder_path", os.path.join(base, "text_encoder"),
        "--dino_path", os.path.join(base, "dinov2"),
    ]
    assert goldens_main(["capture", *model_args, "--vae_res", "64",
                         "--out", goldens]) == 0

    import numpy as np_  # noqa: PLC0415

    bundle = np_.load(goldens)
    # the cascade actually captured: block taps, VL ladder, M-RoPE, vision
    assert "dit_blk00_img" in bundle.files
    assert "dit_blk01_txt" in bundle.files
    assert "vl_hidden_l00" in bundle.files
    assert "vl_mrope_pos_ref" in bundle.files
    assert "vl_vision_ref" in bundle.files
    assert "dino_feats_ref" in bundle.files

    assert goldens_main(["compare", "--goldens", goldens, *model_args,
                         "--fail_above", "0.01"]) == 0

    # the gate really gates: a corrupted tap must fail the compare
    corrupt = {k: bundle[k] for k in bundle.files}
    corrupt["dit_blk01_img"] = corrupt["dit_blk01_img"] + 1.0
    bad = str(tmp_path / "bad.npz")
    np_.savez_compressed(bad, **corrupt)
    assert goldens_main(["compare", "--goldens", bad, *model_args,
                         "--fail_above", "0.01"]) == 1
