"""Quality-metric registry behaviour (extensions/quality_metric.py)."""

import numpy as np
import pytest

from physicedit_tpu.extensions.quality_metric import (GatedMetricError,
                                                      download_preference_model,
                                                      load_preference_model,
                                                      model_dict)


def test_registry_names_match_reference():
    # reference model_dict keys (ImageQualityMetric/__init__.py:21-133)
    for name in ("ImageReward", "Aesthetic", "PickScore", "CLIP",
                 "HPSv2", "HPSv2.1", "MPS"):
        assert name in model_dict


def test_download_resolves_paths_without_network():
    paths = download_preference_model("Aesthetic", cache_dir="/tmp/qm")
    assert paths["clip-large"].endswith("clip-vit-large-patch14")


def test_checkpoint_backed_metrics_gate_cleanly():
    with pytest.raises(GatedMetricError):
        load_preference_model("CLIP",
                              path={"clip": "/nonexistent/clip"})
    with pytest.raises(GatedMetricError):
        load_preference_model("ImageReward")


# ---------------------------------------------------------------------------
# ImageReward / HPS tower parity vs the HF transformers ports (tiny random)
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().float().numpy()


def _tiny_blip_vision(seed=0):
    import torch
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers import BlipVisionConfig

    torch.manual_seed(seed)
    cfg = BlipVisionConfig(hidden_size=128, intermediate_size=256,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=24, patch_size=8, layer_norm_eps=1e-6)
    return BlipVisionModel(cfg).eval()


def _vit_sd_from_hf(vm, prefix=""):
    """HF BlipVisionModel state dict -> the timm keyspace the published
    ImageReward.safetensors uses (blip.visual_encoder.*)."""
    sd = {}
    s = vm.state_dict()
    # BlipVisionModel state dicts carry no "vision_model." prefix when the
    # tower is instantiated standalone
    pre = ("vision_model."
           if any(k.startswith("vision_model.") for k in s) else "")
    sd[prefix + "cls_token"] = _np(s[pre + "embeddings.class_embedding"])
    sd[prefix + "pos_embed"] = _np(s[pre + "embeddings.position_embedding"])
    sd[prefix + "patch_embed.proj.weight"] = _np(
        s[pre + "embeddings.patch_embedding.weight"])
    sd[prefix + "patch_embed.proj.bias"] = _np(
        s[pre + "embeddings.patch_embedding.bias"])
    n = vm.config.num_hidden_layers
    for i in range(n):
        src = f"{pre}encoder.layers.{i}."
        dst = prefix + f"blocks.{i}."
        remap = {
            "attn.qkv.weight": "self_attn.qkv.weight",
            "attn.qkv.bias": "self_attn.qkv.bias",
            "attn.proj.weight": "self_attn.projection.weight",
            "attn.proj.bias": "self_attn.projection.bias",
            "norm1.weight": "layer_norm1.weight",
            "norm1.bias": "layer_norm1.bias",
            "norm2.weight": "layer_norm2.weight",
            "norm2.bias": "layer_norm2.bias",
            "mlp.fc1.weight": "mlp.fc1.weight",
            "mlp.fc1.bias": "mlp.fc1.bias",
            "mlp.fc2.weight": "mlp.fc2.weight",
            "mlp.fc2.bias": "mlp.fc2.bias",
        }
        for d, srck in remap.items():
            sd[dst + d] = _np(s[src + srck])
    sd[prefix + "norm.weight"] = _np(s[pre + "post_layernorm.weight"])
    sd[prefix + "norm.bias"] = _np(s[pre + "post_layernorm.bias"])
    return sd


def _tiny_blip_text(seed=1, encoder_width=128, hidden=64):
    import torch
    from transformers.models.blip.modeling_blip_text import BlipTextModel
    from transformers import BlipTextConfig

    torch.manual_seed(seed)
    cfg = BlipTextConfig(vocab_size=60, hidden_size=hidden,
                         encoder_hidden_size=encoder_width,
                         intermediate_size=2 * hidden, num_hidden_layers=2,
                         num_attention_heads=2,
                         max_position_embeddings=40,
                         is_decoder=True)  # creates the cross-attn layers
    return BlipTextModel(cfg, add_pooling_layer=False).eval()


def test_blip_vit_parity_vs_hf():
    import torch

    from physicedit_tpu.models import blip

    vm = _tiny_blip_vision()
    sd = _vit_sd_from_hf(vm)
    params, cfg = blip.blip_vit_from_torch(sd)
    assert (cfg.width, cfg.depth, cfg.patch_size) == (128, 2, 8)
    # heads: width 128 -> 128//64 = 2, matching the HF config
    assert cfg.num_heads == 2

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        want = vm(torch.tensor(pixels.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()
    got = np.asarray(blip.blip_vit_forward(params, cfg, pixels))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_blip_text_parity_vs_hf():
    import torch

    from physicedit_tpu.models import blip

    tm = _tiny_blip_text()
    sd = {k: _np(v) for k, v in tm.state_dict().items()}
    params, cfg = blip.blip_text_from_torch(sd, num_heads=2)
    assert (cfg.hidden_size, cfg.num_layers, cfg.encoder_width) == (64, 2, 128)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 60, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0  # padded row exercises the additive mask
    enc = rng.normal(size=(2, 10, 128)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.tensor(ids.astype(np.int64)),
                  attention_mask=torch.tensor(mask.astype(np.int64)),
                  encoder_hidden_states=torch.tensor(enc),
                  is_decoder=False).last_hidden_state.numpy()
    got = np.asarray(blip.blip_text_forward(params, cfg, ids, mask, enc))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class _FixedTokenizer:
    """Deterministic bert-style stub: CLS + hashed word ids + SEP, padded."""

    def __call__(self, text, padding=None, truncation=None, max_length=35):
        ids = [2] + [3 + (hash(w) % 50) for w in text.split()][:max_length - 2] + [4]
        mask = [1] * len(ids) + [0] * (max_length - len(ids))
        ids = ids + [0] * (max_length - len(ids))
        return {"input_ids": ids, "attention_mask": mask}


def test_imagereward_scores_synthetic_checkpoint(tmp_path):
    """VERDICT r4 #5 done-bar: load_preference_model("ImageReward") scores
    a synthetic-weight checkpoint, and the score matches the torch oracle
    composed exactly like reference imagereward.py:125-148."""
    import torch
    from safetensors.numpy import save_file

    from physicedit_tpu.extensions import quality_metric as qm
    from physicedit_tpu.models.blip import (IMAGEREWARD_MEAN,
                                            IMAGEREWARD_STD, preprocess_blip)
    from PIL import Image

    vm = _tiny_blip_vision()
    # hidden 128 -> the converter's width//64 head inference matches the
    # HF config (the published 768-wide ckpt hits the {768: 12} table row)
    tm = _tiny_blip_text(encoder_width=128, hidden=128)
    sd = _vit_sd_from_hf(vm, prefix="blip.visual_encoder.")
    sd.update({"blip.text_encoder." + k: _np(v)
               for k, v in tm.state_dict().items()})
    rng = np.random.default_rng(7)
    dims = [(128, 32), (32, 16), (16, 8), (8, 4), (4, 1)]
    for idx, (d_in, d_out) in zip((0, 2, 4, 6, 7), dims):
        sd[f"mlp.layers.{idx}.weight"] = (
            rng.normal(size=(d_out, d_in)).astype(np.float32) * 0.1)
        sd[f"mlp.layers.{idx}.bias"] = (
            rng.normal(size=(d_out,)).astype(np.float32) * 0.1)
    ckpt = str(tmp_path / "ImageReward.safetensors")
    save_file(sd, ckpt)

    tok = _FixedTokenizer()
    scorer = qm.ImageRewardScore(ckpt, tokenizer=tok)
    img = Image.fromarray(
        rng.integers(0, 255, (30, 40, 3), dtype=np.uint8))
    got = scorer.score(img, "a glass tips over")

    # torch oracle: the exact reference composition
    enc = tok("a glass tips over")
    ids = torch.tensor([enc["input_ids"]])
    mask = torch.tensor([enc["attention_mask"]])
    pixels = preprocess_blip(img, 24)
    with torch.no_grad():
        image_embeds = vm(torch.tensor(pixels.transpose(0, 3, 1, 2))
                          ).last_hidden_state
        txt = tm(ids, attention_mask=mask,
                 encoder_hidden_states=image_embeds,
                 is_decoder=False).last_hidden_state[:, 0, :].numpy()
    x = txt
    for idx, _ in zip((0, 2, 4, 6, 7), dims):
        x = x @ sd[f"mlp.layers.{idx}.weight"].T + sd[f"mlp.layers.{idx}.bias"]
    want = float((x[0, 0] - IMAGEREWARD_MEAN) / IMAGEREWARD_STD)
    assert got == pytest.approx(want, rel=2e-3, abs=2e-4)

    # list form is per-image
    got2 = scorer.score([img, img], "a glass tips over")
    assert got2[0] == pytest.approx(got, abs=1e-5)
    # registry route gates cleanly on the missing bert tokenizer folder
    with pytest.raises(GatedMetricError, match="bert tokenizer"):
        qm.load_preference_model(
            "ImageReward", path={"imagereward": ckpt,
                                 "bert_model_path": None})


def test_imageward_registry_gates_on_missing_tokenizer(tmp_path):
    from physicedit_tpu.extensions import quality_metric as qm

    with pytest.raises(GatedMetricError, match="ImageReward checkpoint"):
        qm.ImageRewardScore(str(tmp_path / "missing.safetensors"))


def _tiny_hf_clip(seed=0):
    import torch
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(seed)
    cfg = CLIPConfig(
        text_config=dict(vocab_size=64, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=2, max_position_embeddings=16,
                         hidden_act="gelu", eos_token_id=63,
                         bos_token_id=62, pad_token_id=0,
                         projection_dim=32),
        vision_config=dict(hidden_size=128, intermediate_size=256,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=24, patch_size=8, hidden_act="gelu",
                           projection_dim=32),
        projection_dim=32)
    return CLIPModel(cfg).eval()


def _openclip_sd_from_hf(model):
    """HF CLIPModel -> open_clip state-dict key space (what the published
    HPS_v2 safetensors uses)."""
    import torch

    s = model.state_dict()
    sd = {}
    sd["visual.class_embedding"] = _np(
        s["vision_model.embeddings.class_embedding"])
    sd["visual.positional_embedding"] = _np(
        s["vision_model.embeddings.position_embedding.weight"])
    sd["visual.conv1.weight"] = _np(
        s["vision_model.embeddings.patch_embedding.weight"])
    sd["visual.ln_pre.weight"] = _np(s["vision_model.pre_layrnorm.weight"])
    sd["visual.ln_pre.bias"] = _np(s["vision_model.pre_layrnorm.bias"])
    sd["visual.ln_post.weight"] = _np(s["vision_model.post_layernorm.weight"])
    sd["visual.ln_post.bias"] = _np(s["vision_model.post_layernorm.bias"])
    sd["visual.proj"] = _np(s["visual_projection.weight"]).T

    def tower(src_prefix, dst_prefix, n):
        for i in range(n):
            src = f"{src_prefix}.encoder.layers.{i}."
            dst = f"{dst_prefix}.resblocks.{i}."
            q = _np(s[src + "self_attn.q_proj.weight"])
            k = _np(s[src + "self_attn.k_proj.weight"])
            v = _np(s[src + "self_attn.v_proj.weight"])
            sd[dst + "attn.in_proj_weight"] = np.concatenate([q, k, v], 0)
            sd[dst + "attn.in_proj_bias"] = np.concatenate(
                [_np(s[src + f"self_attn.{x}_proj.bias"])
                 for x in "qkv"], 0)
            sd[dst + "attn.out_proj.weight"] = _np(
                s[src + "self_attn.out_proj.weight"])
            sd[dst + "attn.out_proj.bias"] = _np(
                s[src + "self_attn.out_proj.bias"])
            for a, b in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
                sd[dst + a + ".weight"] = _np(s[src + b + ".weight"])
                sd[dst + a + ".bias"] = _np(s[src + b + ".bias"])
            for a, b in (("mlp.c_fc", "mlp.fc1"), ("mlp.c_proj", "mlp.fc2")):
                sd[dst + a + ".weight"] = _np(s[src + b + ".weight"])
                sd[dst + a + ".bias"] = _np(s[src + b + ".bias"])

    tower("vision_model", "visual.transformer", 2)
    tower("text_model", "transformer", 2)
    sd["token_embedding.weight"] = _np(
        s["text_model.embeddings.token_embedding.weight"])
    sd["positional_embedding"] = _np(
        s["text_model.embeddings.position_embedding.weight"])
    sd["ln_final.weight"] = _np(s["text_model.final_layer_norm.weight"])
    sd["ln_final.bias"] = _np(s["text_model.final_layer_norm.bias"])
    sd["text_projection"] = _np(s["text_projection.weight"]).T
    sd["logit_scale"] = _np(s["logit_scale"])
    return sd


def test_openclip_parity_vs_hf_clip():
    import torch

    from physicedit_tpu.models import openclip

    model = _tiny_hf_clip()
    sd = _openclip_sd_from_hf(model)
    # tiny text width 64 needs the explicit head override (the real ViT-H
    # text tower is 1024-wide: 1024//64 = 16 matches the registry)
    params, vcfg, tcfg = openclip.openclip_from_state_dict(sd, text_heads=2)
    assert (vcfg.width, vcfg.layers, vcfg.heads) == (128, 2, 2)
    assert (tcfg.width, tcfg.layers, tcfg.heads) == (64, 2, 2)

    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(2, 24, 24, 3)).astype(np.float32)
    # EOT (=63, the max id) placed once per row -> HF eos pooling and
    # open_clip argmax pooling agree
    ids = rng.integers(1, 60, (2, 12)).astype(np.int32)
    ids[0, 7] = 63
    ids[0, 8:] = 0
    ids[1, 11] = 63
    with torch.no_grad():
        img_w = model.get_image_features(
            torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
        txt_w = model.get_text_features(
            torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor((ids != 0).astype(np.int64))
        ).numpy()
    # NB open_clip applies no padding mask on text (causal only) — HF
    # masks pads.  With EOT at the row end and causal attention, pads
    # after EOT cannot influence the pooled token, so both agree.
    img_g = np.asarray(openclip.clip_image_features(
        params["visual"], vcfg, pixels))
    txt_g = np.asarray(openclip.clip_text_features(
        params["text"], tcfg, ids))
    np.testing.assert_allclose(img_g, img_w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(txt_g, txt_w, rtol=2e-4, atol=2e-5)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    want = np.sum(norm(img_w) * norm(txt_w), -1)
    got = np.asarray(openclip.clip_similarity(params, vcfg, tcfg, pixels, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_hps_scores_synthetic_checkpoint(tmp_path):
    """HPSv2 lane end to end: open_clip-keyspace safetensors + injected
    tokenizer -> load_preference_model route -> score()."""
    from safetensors.numpy import save_file
    from PIL import Image

    from physicedit_tpu.extensions import quality_metric as qm

    sd = _openclip_sd_from_hf(_tiny_hf_clip())
    ckpt = str(tmp_path / "HPS_v2_compressed.safetensors")
    save_file(sd, ckpt)

    class Tok:
        def tokenize(self, texts, context_length=77):
            out = np.zeros((len(texts), 16), np.int32)
            for i, t in enumerate(texts):
                ids = [62] + [1 + (hash(w) % 58) for w in t.split()][:13] + [63]
                out[i, :len(ids)] = ids
            return out

    scorer = qm.HPScoreV2(ckpt, tokenizer=Tok(), vision_heads=2,
                          text_heads=2)
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (40, 28, 3), dtype=np.uint8))
    s1 = scorer.score(img, "a falling cup")
    assert -1.0 <= s1 <= 1.0
    s_list = scorer.score([img, img], "a falling cup")
    assert s_list[0] == pytest.approx(s1, abs=1e-5)
    with pytest.raises(GatedMetricError, match="HPS checkpoint"):
        qm.HPScoreV2(str(tmp_path / "missing.safetensors"))


def test_clip_bpe_matches_transformers_tokenizer(tmp_path):
    """The from-scratch BPE must agree with transformers' CLIPTokenizer
    given the same merge ranks (vocab generated from our encoder so both
    sides share id space; the MERGE ALGORITHM is what's under test)."""
    import gzip
    import json

    from physicedit_tpu.extensions.clip_bpe import ClipBpeTokenizer

    merges = ["i n", "t h", "th e</w>", "a n", "an d</w>", "in g</w>",
              "h e", "o v", "ov e", "ove r</w>", "t i", "ti p", "tip s</w>"]
    gz = str(tmp_path / "bpe.txt.gz")
    with gzip.open(gz, "wt") as f:
        f.write("#version: tiny\n" + "\n".join(merges) + "\n")
    tok = ClipBpeTokenizer(gz, max_merges=len(merges))

    from transformers import CLIPTokenizer

    vocab_file = str(tmp_path / "vocab.json")
    merges_file = str(tmp_path / "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: tiny\n" + "\n".join(merges) + "\n")
    hf = CLIPTokenizer(vocab_file, merges_file)

    for text in ("the cup tips over", "And THE glass, breaking!",
                 "ink & ether", "over-the-top"):
        assert tok.encode(text) == hf(text)["input_ids"][1:-1], text
    # tokenize(): SOT/EOT framing + zero padding (open_clip semantics)
    arr = tok.tokenize("the cup tips over", context_length=12)
    assert arr.shape == (1, 12)
    assert arr[0, 0] == tok.sot and tok.eot in arr[0]
    assert arr[0, -1] == 0  # padded


def test_reference_free_metrics():
    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3)).astype(np.float32)
    noisy = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.05,
                    0, 1)

    psnr = load_preference_model("PSNR")
    assert psnr.score(a, a) == float("inf")
    assert 20.0 < psnr.score(noisy, a) < 40.0

    ssim = load_preference_model("SSIM")
    s_same, s_noisy = ssim.score([a, noisy], a)
    assert s_same > 0.99 and s_noisy < s_same
