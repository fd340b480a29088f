"""Golden-activation capture + comparison against real checkpoints.

Real-weight validation harness (this environment has no model downloads;
the tool is ready for a machine that does).  One command per side:

  capture: load the real torch/HF models and write inputs + reference
      activations to an .npz — the staged configs from BASELINE.md plus a
      PER-LAYER CASCADE so a conversion bug localises to the first
      diverging layer instead of "the end is wrong":
        - VAE encode/decode round trip (stage 2; --vae_res, default 1024)
        - DiT: one CFG denoise step, fixed seed (stage 3) + every
          transformer block's (txt, img) output via forward hooks
        - Qwen2.5-VL text encoder: hidden states every 4 layers on a
          fixed id sequence, + the M-RoPE position cascade for an
          image-bearing sequence (get_rope_index)
        - Qwen2.5-VL vision tower: merger output on a fixed patch grid
          (the windowed ViT path)
        - DINOv2 features on a 512-sq image (stage 1)
  compare: load the same checkpoints through physicedit_tpu's converters,
      replay the captured inputs layer by layer, and report per-tap
      max/mean abs error, rel-L2 and PSNR, plus LPIPS when the decoded
      image pair exists (the parity gate of SURVEY.md section 7.4).
      ``--fail_above REL`` turns the report into a GATE: exit 1 when any
      tap's rel-L2 exceeds it.

Usage:
  python tools/capture_goldens.py capture --vae_path ... [--dit_path ...]
      [--text_encoder_path ...] [--dino_path ...] --out goldens.npz
  python tools/capture_goldens.py compare --goldens goldens.npz --vae_path ...
      [--dit_path ...] [--text_encoder_path ...] [--dino_path ...]
      [--fail_above 0.02]

Every stage is optional and independent: pass only the checkpoints you
have; capture stores whatever reference activations it could compute and
compare checks whatever the bundle contains.  Both directions are
rehearsed in CI on synthetic full-width checkpoints
(tests/test_cli_validate.py golden-capture round-trip).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This tool is a parity GATE: fp32 activations must actually be computed at
# fp32.  JAX's default matmul precision rounds operands to bf16 on both CPU
# and TPU, which alone contributes ~0.2% rel-L2 per linear layer — enough to
# swamp a real conversion bug.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def _dit_inputs(rng, txt_dim=3584):
    """Fixed stage-3 inputs: CFG pair, 256-sq latents + 77-token text."""
    return {
        "dit_latents": rng.normal(size=(1, 32, 32, 16)).astype(np.float32),
        "dit_txt": rng.normal(size=(2, 77, txt_dim)).astype(np.float32) * 0.1,
        "dit_t": np.asarray([0.5, 0.5], np.float32),
    }


def _build_ref_dit(ref_dit_mod, sd, n_layers):
    """Reference QwenImageDiT at the checkpoint's width.

    Real checkpoints use the hard-coded 3072/3584; the CI round-trip
    rehearses on a tiny-width synthetic tree, so rebuild the module from
    the reference's own parameterizable pieces when widths differ
    (qwen_image_dit.py:404-430 — same classes, same forward)."""
    import torch

    dim = int(sd["img_in.weight"].shape[0])
    txt_dim = int(sd["txt_in.weight"].shape[1])
    if dim == 3072 and txt_dim == 3584:
        return ref_dit_mod.QwenImageDiT(num_layers=n_layers)
    m = ref_dit_mod.QwenImageDiT.__new__(ref_dit_mod.QwenImageDiT)
    torch.nn.Module.__init__(m)
    m.pos_embed = ref_dit_mod.QwenEmbedRope(
        theta=10000, axes_dim=[16, 56, 56], scale_rope=True)
    m.time_text_embed = ref_dit_mod.TimestepEmbeddings(
        256, dim, diffusers_compatible_format=True, scale=1000,
        align_dtype_to_timestep=True)
    m.txt_norm = ref_dit_mod.RMSNorm(txt_dim, eps=1e-6)
    m.img_in = torch.nn.Linear(64, dim)
    m.txt_in = torch.nn.Linear(txt_dim, dim)
    m.transformer_blocks = torch.nn.ModuleList([
        ref_dit_mod.QwenImageTransformerBlock(
            dim=dim, num_attention_heads=dim // 128, attention_head_dim=128)
        for _ in range(n_layers)])
    m.norm_out = ref_dit_mod.AdaLayerNorm(dim, single=True)
    m.proj_out = torch.nn.Linear(dim, 64)
    return m


def _resolve_ckpt(path: str) -> str:
    """Accept a safetensors file or an HF directory (save_pretrained).

    Directories pass through as-is: io.safetensors_io.load_state_dict
    merges every shard it finds (picking one file would silently drop
    half of a sharded checkpoint)."""
    if os.path.isdir(path):
        if not any(f.endswith(".safetensors") for f in os.listdir(path)):
            raise FileNotFoundError(f"no .safetensors under {path}")
    return path


def _hf_config(path: str):
    """config.json next to an HF checkpoint dir, or None."""
    import json

    cfg_path = os.path.join(path if os.path.isdir(path)
                            else os.path.dirname(path), "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f)
    return None


# Fixed M-RoPE probe: ids with one (1, 4, 4) image grid (4 merged pads at
# spatial_merge 2), the cascade get_rope_index must reproduce.
MROPE_GRID = (1, 4, 4)


def _mrope_ids(image_pad_id: int, vision_start_id: int) -> np.ndarray:
    n_pads = (MROPE_GRID[1] // 2) * (MROPE_GRID[2] // 2)
    return np.asarray([1, 5, 6, vision_start_id]
                      + [image_pad_id] * n_pads + [7, 8, 9], np.int32)


def _load_ref_module(reference_path: str, dotted: str):
    """Import e.g. 'models.qwen_image_vae' from the reference tree via a
    synthetic package (same trick as tests/conftest.py) — importing
    ``diffsynth`` itself triggers __init__ side-effects (modelscope, ...)
    that are not installed here."""
    import importlib
    import types

    root = os.path.join(reference_path, "diffsynth")
    if "refds" not in sys.modules:
        for name, sub in [("refds", ""), ("refds.models", "models"),
                          ("refds.schedulers", "schedulers")]:
            mod = types.ModuleType(name)
            mod.__path__ = [os.path.join(root, sub)]
            sys.modules[name] = mod
    return importlib.import_module(f"refds.{dotted}")


def capture(args):
    import torch

    rng = np.random.default_rng(0)
    out = {}

    from physicedit_tpu.io.safetensors_io import load_state_dict

    # --- VAE round trip -------------------------------------------------
    if args.vae_path:
        res = args.vae_res
        img = rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32)
        out["vae_input"] = img
        try:
            QwenImageVAE = _load_ref_module(
                args.reference_path, "models.qwen_image_vae").QwenImageVAE

            vae_sd = load_state_dict(_resolve_ckpt(args.vae_path))
            vae = QwenImageVAE(
                base_dim=int(vae_sd["encoder.conv_in.weight"].shape[0]))
            vae.load_state_dict({k: torch.tensor(np.asarray(v))
                                 for k, v in vae_sd.items()})
            vae = vae.eval()
            with torch.no_grad():
                z = vae.encode(torch.tensor(img))
                rec = vae.decode(z)
            out["vae_latent_ref"] = z.numpy()
            out["vae_recon_ref"] = rec.numpy()
        except ImportError:
            print("[capture] reference torch VAE unavailable; inputs only")

    # --- DiT: one CFG forward + per-block taps ----------------------------
    if args.dit_path:
        try:
            ref_dit_mod = _load_ref_module(
                args.reference_path, "models.qwen_image_dit")

            dit_sd = load_state_dict(_resolve_ckpt(args.dit_path))
            n_layers = 1 + max(int(k.split(".")[1]) for k in dit_sd
                               if k.startswith("transformer_blocks."))
            txt_dim = int(dit_sd["txt_in.weight"].shape[1])
            out.update(_dit_inputs(rng, txt_dim))
            dit = _build_ref_dit(ref_dit_mod, dit_sd, n_layers)
            dit.load_state_dict({k: torch.tensor(np.asarray(v))
                                 for k, v in dit_sd.items()})
            dit = dit.eval()

            taps = {}

            def mk_hook(i):
                def hook(_mod, _inp, outp):
                    text, image = outp
                    taps.setdefault(f"dit_blk{i:02d}_txt", []).append(
                        text.detach().float().numpy())
                    taps.setdefault(f"dit_blk{i:02d}_img", []).append(
                        image.detach().float().numpy())
                return hook

            for i, blk in enumerate(dit.transformer_blocks):
                blk.register_forward_hook(mk_hook(i))
            # the reference rope treats latents.shape[0] as the FRAME axis
            # (qwen_image_dit.py:501-510 img_shapes), so CFG is two B=1
            # forwards — same convention as the reference pipeline.
            lat = torch.tensor(out["dit_latents"].transpose(0, 3, 1, 2))
            vs = []
            with torch.no_grad():
                for b in range(2):
                    # dit.forward's TimestepEmbeddings carries scale=1000
                    # internally (utils.py:274-293), so pass t in [0,1] —
                    # same convention as model_fn's `timestep / 1000`
                    # (qwen_image_physical.py:1342).
                    vs.append(dit(
                        latents=lat,
                        timestep=torch.tensor(out["dit_t"][b:b + 1]),
                        prompt_emb=torch.tensor(out["dit_txt"][b:b + 1]),
                        prompt_emb_mask=torch.ones(1, 77, dtype=torch.bool),
                        height=256, width=256).numpy())
            out["dit_out_ref"] = np.concatenate(vs, 0)
            for name, pair in taps.items():
                out[name] = np.concatenate(pair, 0)
            out["dit_num_layers"] = np.asarray(n_layers, np.int32)
        except Exception as e:  # noqa: BLE001 — signature drift tolerated
            print(f"[capture] reference DiT forward failed ({e}); inputs only")

    # --- VL text encoder: per-layer hidden states + M-RoPE cascade --------
    if args.text_encoder_path:
        try:
            from transformers import Qwen2_5_VLForConditionalGeneration  # noqa: PLC0415

            model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
                args.text_encoder_path, torch_dtype=torch.float32).eval()
            cfg = model.config
            rng_ids = np.random.default_rng(1)
            ids = rng_ids.integers(
                5, min(500, cfg.vocab_size - 5), size=(1, 23)).astype(np.int64)
            with torch.no_grad():
                hs = model.model.language_model(
                    input_ids=torch.tensor(ids),
                    output_hidden_states=True).hidden_states
            out["vl_ids"] = ids
            for j in range(0, len(hs), 4):
                out[f"vl_hidden_l{j:02d}"] = hs[j].numpy()
            out["vl_hidden_ref"] = hs[-1].numpy()
            out["vl_num_hidden"] = np.asarray(len(hs), np.int32)

            # M-RoPE cascade: position ids for an image-bearing sequence
            mids = _mrope_ids(cfg.image_token_id, cfg.vision_start_token_id)
            grid = torch.tensor([list(MROPE_GRID)])
            get_rope = getattr(model, "get_rope_index",
                               getattr(model.model, "get_rope_index", None))
            if get_rope is not None:
                pos, _ = get_rope(torch.tensor(mids[None].astype(np.int64)),
                                  image_grid_thw=grid)
                out["vl_mrope_ids"] = mids
                out["vl_mrope_pos_ref"] = pos.numpy()[:, 0]

            # Vision tower: merger output on a fixed (1, 8, 8) patch grid
            vc = cfg.vision_config
            in_dim = (vc.in_channels * vc.temporal_patch_size
                      * vc.patch_size ** 2)
            patches = (rng.normal(size=(64, in_dim)) * 0.1).astype(np.float32)
            with torch.no_grad():
                vis = model.visual(torch.tensor(patches),
                                   grid_thw=torch.tensor([[1, 8, 8]]))
            out["vl_vision_patches"] = patches
            out["vl_vision_ref"] = vis.numpy()
        except Exception as e:  # noqa: BLE001
            print(f"[capture] HF VL encoder failed ({e})")

    # --- DINOv2 features --------------------------------------------------
    if args.dino_path:
        img = rng.uniform(0, 1, (1, 3, 512, 512)).astype(np.float32)
        out["dino_input"] = img
        try:
            from transformers import AutoModel  # noqa: PLC0415

            model = AutoModel.from_pretrained(args.dino_path,
                                              torch_dtype=torch.float32)
            # PhysicEdit's wrapper strips the final-LN affine and drops
            # 1 CLS + 4 register tokens (reference pipelines/dinov2.py:
            # 20-32) — capture what the pipeline actually consumes.
            model.layernorm.elementwise_affine = False
            model.layernorm.weight = None
            model.layernorm.bias = None
            with torch.no_grad():
                feats = model(pixel_values=torch.tensor(img)).last_hidden_state
            out["dino_feats_ref"] = feats.numpy()[:, 5:]
        except Exception as e:  # noqa: BLE001
            print(f"[capture] HF DINOv2 failed ({e}); input only")

    np.savez_compressed(args.out, **out)
    print(f"[capture] wrote {args.out} ({sorted(out)})")


class Report:
    """Per-tap error ledger with an optional rel-L2 gate."""

    def __init__(self, fail_above=None):
        self.fail_above = fail_above
        self.taps = {}

    def add(self, name, got, ref):
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        err = np.abs(got - ref)
        denom = float(np.abs(ref).max()) or 1.0
        psnr = 20 * np.log10(denom / (np.sqrt((err ** 2).mean()) + 1e-12))
        rel = float(np.linalg.norm(got - ref)
                    / max(np.linalg.norm(ref), 1e-12))
        self.taps[name] = rel
        flag = ""
        if self.fail_above is not None and rel > self.fail_above:
            flag = f"  <-- FAIL (> {self.fail_above})"
        print(f"[compare] {name}: max {err.max():.4e} mean {err.mean():.4e} "
              f"relL2 {rel:.4e} PSNR {psnr:.1f} dB{flag}")

    def finish(self):
        if not self.taps:
            print("[compare] no taps compared")
            return 0
        worst = max(self.taps, key=self.taps.get)
        print(f"[compare] {len(self.taps)} taps; worst relL2 "
              f"{self.taps[worst]:.4e} at {worst}")
        if self.fail_above is not None:
            bad = {k: v for k, v in self.taps.items()
                   if v > self.fail_above}
            if bad:
                print(f"[compare] GATE FAILED: {len(bad)} taps above "
                      f"{self.fail_above}: {sorted(bad)}")
                return 1
            print(f"[compare] GATE PASSED (all taps <= {self.fail_above})")
        return 0


def compare(args):
    import jax
    import jax.numpy as jnp

    from physicedit_tpu.io.safetensors_io import load_state_dict

    goldens = np.load(args.goldens)
    rep = Report(args.fail_above)

    if args.vae_path and "vae_input" in goldens:
        from physicedit_tpu.io.convert import (vae_config_from_params,
                                               vae_from_torch)
        from physicedit_tpu.models import vae as jvae

        vae_params = vae_from_torch(load_state_dict(
            _resolve_ckpt(args.vae_path)), dtype=jnp.float32)
        vae_cfg = vae_config_from_params(vae_params)
        img = goldens["vae_input"]
        z = jvae.encode(vae_params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                        vae_cfg)
        rec = jvae.decode(vae_params, z, vae_cfg)
        if "vae_latent_ref" in goldens:
            rep.add("VAE latent", np.asarray(z).transpose(0, 3, 1, 2),
                    goldens["vae_latent_ref"])
        print(f"[compare] VAE reconstruction: mean abs "
              f"{np.abs(np.asarray(rec).transpose(0,3,1,2) - img).mean():.4f}")
        if "vae_recon_ref" in goldens:
            ours = np.asarray(rec).transpose(0, 3, 1, 2)
            rep.add("VAE recon vs reference", ours, goldens["vae_recon_ref"])
            try:
                from physicedit_tpu.eval.metrics import lpips  # noqa: PLC0415

                val = lpips(ours[0].transpose(1, 2, 0),
                            goldens["vae_recon_ref"][0].transpose(1, 2, 0))
                if val is None:
                    print("[compare] LPIPS unavailable (no lpips package "
                          "/ VGG weights in this environment)")
                else:
                    print(f"[compare] LPIPS(ours, reference recon): "
                          f"{val:.4f}")
            except Exception as e:  # noqa: BLE001
                print(f"[compare] LPIPS unavailable: {e}")

    if args.dit_path and "dit_latents" in goldens:
        from physicedit_tpu.io.convert import (dit_config_from_params,
                                               dit_from_torch)
        from physicedit_tpu.models import dit as jdit
        from physicedit_tpu.ops import rope as jrope
        from physicedit_tpu.ops.patchify import patchify

        params = dit_from_torch(load_state_dict(_resolve_ckpt(args.dit_path)),
                                dtype=jnp.float32)
        cfg = dit_config_from_params(params)
        lat = jnp.asarray(goldens["dit_latents"])
        tokens = patchify(lat)
        tokens = jnp.concatenate([tokens, tokens], 0)
        ic, isn, tc, ts = map(jnp.asarray, jrope.build_rope_tables(
            [(1, 16, 16)], 77))
        outv = jdit.dit_forward(params, cfg, tokens,
                                jnp.asarray(goldens["dit_txt"]),
                                jnp.asarray(goldens["dit_t"]), ic, isn, tc, ts)
        # the reference forward returns TOKENS [B, S, 64] (its final
        # rearrange is computed but discarded, qwen_image_dit.py:559-560)
        ours = np.asarray(outv)
        if "dit_out_ref" in goldens:
            rep.add("DiT CFG step", ours, goldens["dit_out_ref"])

        if any(k.startswith("dit_blk") for k in goldens.files):
            # Per-block cascade: replay block_forward sequentially on the
            # unstacked tree against each captured block tap, reproducing
            # dit_forward's pre-block embeddings (models/dit.py).
            from physicedit_tpu.core.params import linear
            from physicedit_tpu.ops.norms import rms_norm

            dtype = jnp.float32
            image = linear(params["img_in"], tokens)
            text = linear(params["txt_in"],
                          rms_norm(jnp.asarray(goldens["dit_txt"]),
                                   params["txt_norm"]["scale"], cfg.eps))
            temb = jdit.timestep_embedding(jnp.asarray(goldens["dit_t"]),
                                           cfg.time_dim, dtype)
            temb = linear(params["time_embed"]["linear_2"],
                          jax.nn.silu(linear(params["time_embed"]["linear_1"],
                                             temb)))
            temb_silu = jax.nn.silu(temb)
            n_layers = (int(goldens["dit_num_layers"])
                        if "dit_num_layers" in goldens.files
                        else cfg.num_layers)
            for i in range(n_layers):
                blk = jax.tree_util.tree_map(lambda x, i=i: x[i],
                                             params["blocks"])
                text, image = jdit.block_forward(
                    blk, cfg, image, text, temb_silu, ic, isn, tc, ts,
                    joint_key_mask=None, attn_clamp=False)
                if f"dit_blk{i:02d}_img" in goldens:
                    rep.add(f"DiT block {i:02d} img", np.asarray(image),
                            goldens[f"dit_blk{i:02d}_img"])
                    rep.add(f"DiT block {i:02d} txt", np.asarray(text),
                            goldens[f"dit_blk{i:02d}_txt"])

        if getattr(args, "quantize", None):
            # int4-vs-fp32 output delta on REAL weights (the quality bound
            # the single-chip W4A8 serving mode ships with, docs/SERVING.md)
            if args.quantize == "int4":
                from physicedit_tpu.kernels.quant_matmul import \
                    quantize_tree_int4 as _q
            else:
                from physicedit_tpu.ops.quant import quantize_tree as _q
            qparams = _q(jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), params))
            outq = jdit.dit_forward(qparams, cfg,
                                    tokens.astype(jnp.bfloat16),
                                    jnp.asarray(goldens["dit_txt"],
                                                jnp.bfloat16),
                                    jnp.asarray(goldens["dit_t"],
                                                jnp.bfloat16),
                                    ic, isn, tc, ts)
            oq = np.asarray(outq.astype(jnp.float32))
            print(f"[compare] DiT {args.quantize} vs fp32 rel "
                  f"{np.linalg.norm(oq - ours) / np.linalg.norm(ours):.4f} "
                  "(quant quality delta — NOT gated)")

    if args.text_encoder_path and "vl_ids" in goldens:
        from physicedit_tpu.io.convert import (qwen_vl_text_from_torch,
                                               qwen_vl_vision_from_torch,
                                               text_config_from_hf,
                                               vision_config_from_hf)
        from physicedit_tpu.models import qwen_vl as m
        from physicedit_tpu.models import qwen_vl_vision as mv

        sd = load_state_dict(_resolve_ckpt(args.text_encoder_path))
        hf_cfg = _hf_config(args.text_encoder_path)
        tcfg = (text_config_from_hf(hf_cfg) if hf_cfg
                else m.QWEN25_VL_7B_TEXT)
        params = qwen_vl_text_from_torch(sd, dtype=jnp.float32)
        ids = jnp.asarray(goldens["vl_ids"])
        s = ids.shape[1]
        pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, 1, s))
        emb = m.embed_tokens(params, ids)
        if "vl_hidden_l00" in goldens.files:
            # per-layer cascade: replay _layer by hand, tapping every
            # captured hidden state (hidden_states[0] is the embedding;
            # the final entry is post-final-norm, matching HF Qwen2)
            from physicedit_tpu.ops.norms import rms_norm

            cos, sin = m.mrope_cos_sin(pos, tcfg)
            bias = m._causal_bias(jnp.ones((1, s), bool), s)
            x = emb
            n_hidden = (int(goldens["vl_num_hidden"])
                        if "vl_num_hidden" in goldens.files
                        else tcfg.num_layers + 1)
            for j in range(n_hidden):
                name = f"vl_hidden_l{j:02d}"
                if name in goldens.files:
                    tap = (x if j < n_hidden - 1
                           else rms_norm(x, params["norm"]["scale"],
                                         tcfg.eps))
                    rep.add(f"VL hidden layer {j:02d}", np.asarray(tap),
                            goldens[name])
                if j < n_hidden - 1:
                    lp = jax.tree_util.tree_map(lambda t, j=j: t[j],
                                                params["layers"])
                    x, _ = m._layer(lp, tcfg, x, cos, sin, bias)
        hid = m.text_forward(params, tcfg, emb, pos, jnp.ones((1, s), bool))
        if "vl_hidden_ref" in goldens:
            rep.add("VL hidden final", np.asarray(hid),
                    goldens["vl_hidden_ref"])

        if "vl_mrope_ids" in goldens:
            from physicedit_tpu.pipeline import vl_host

            image_pad = (hf_cfg or {}).get("image_token_id", 151655)
            vstart = (hf_cfg or {}).get("vision_start_token_id", 151652)
            pos_ours = vl_host.get_rope_index(
                np.asarray(goldens["vl_mrope_ids"]), [MROPE_GRID],
                image_pad, vstart)
            rep.add("M-RoPE position cascade", pos_ours,
                    goldens["vl_mrope_pos_ref"])

        if "vl_vision_patches" in goldens:
            vcfg = (vision_config_from_hf(hf_cfg["vision_config"])
                    if hf_cfg and "vision_config" in hf_cfg
                    else mv.QWEN25_VL_VISION)
            vparams = qwen_vl_vision_from_torch(sd, dtype=jnp.float32)
            vis = mv.run_vision(vparams, vcfg,
                                jnp.asarray(goldens["vl_vision_patches"]),
                                [(1, 8, 8)])
            rep.add("VL vision tower (windowed ViT)", np.asarray(vis),
                    goldens["vl_vision_ref"])

    if args.dino_path and "dino_input" in goldens:
        from physicedit_tpu.io.convert import (dinov2_config_from_hf,
                                               dinov2_from_torch)
        from physicedit_tpu.models import dinov2 as jdino

        params = dinov2_from_torch(load_state_dict(
            _resolve_ckpt(args.dino_path)), dtype=jnp.float32)
        dino_hf = _hf_config(args.dino_path)
        dcfg = (dinov2_config_from_hf(dino_hf, params) if dino_hf
                else jdino.DinoV2Config())
        feats = jdino.dinov2_features(
            params, dcfg,
            jnp.asarray(goldens["dino_input"].transpose(0, 2, 3, 1)))
        if "dino_feats_ref" in goldens:
            rep.add("DINOv2 features", np.asarray(feats),
                    goldens["dino_feats_ref"])

    return rep.finish()


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("capture", "compare"):
        sp = sub.add_parser(name)
        sp.add_argument("--vae_path", default=None)
        sp.add_argument("--dit_path", default=None)
        sp.add_argument("--text_encoder_path", default=None)
        sp.add_argument("--dino_path", default=None)
        sp.add_argument("--vae_res", type=int, default=1024,
                        help="VAE probe resolution (CI round-trip uses a "
                             "small one; the real-weight gate the default)")
        sp.add_argument("--reference_path",
                        default="/root/reference/DiffSynth-Studio")
        if name == "capture":
            sp.add_argument("--out", default="goldens.npz")
        else:
            sp.add_argument("--goldens", default="goldens.npz")
            sp.add_argument("--quantize", default=None,
                            choices=["int4", "int8"],
                            help="also report the quantized-vs-fp32 DiT "
                                 "output delta (serving quality bound)")
            sp.add_argument("--fail_above", type=float, default=None,
                            help="gate: exit 1 if any tap's rel-L2 "
                                 "exceeds this")
    args = p.parse_args(argv)
    if args.cmd == "capture":
        capture(args)
        return 0
    return compare(args)


if __name__ == "__main__":
    sys.exit(main())
