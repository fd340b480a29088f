"""Golden-activation capture + comparison against real checkpoints.

Real-weight validation harness (this environment has no model downloads;
the tool is ready for a machine that does).  One command per side:

  capture: load the real torch/HF models and write inputs + reference
      activations for every staged config from BASELINE.md to an .npz:
        - VAE encode/decode round trip at 1024-sq (stage 2)
        - DiT: one CFG denoise step, fixed seed, 256-sq (stage 3)
        - Qwen2.5-VL text-encoder hidden states on a fixed prompt
        - DINOv2 features on a 512-sq image (stage 1)
  compare: load the same checkpoints through physicedit_tpu's converters,
      replay the captured inputs, and report per-stage max/mean abs error
      + PSNR, and LPIPS when the decoded-image pair exists (the parity
      gate of SURVEY.md section 7.4).

Usage:
  python tools/capture_goldens.py capture --vae_path ... [--dit_path ...]
      [--text_encoder_path ...] [--dino_path ...] --out goldens.npz
  python tools/capture_goldens.py compare --goldens goldens.npz --vae_path ...
      [--dit_path ...] [--text_encoder_path ...] [--dino_path ...]

Every stage is optional and independent: pass only the checkpoints you
have; capture stores whatever reference activations it could compute and
compare checks whatever the bundle contains.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dit_inputs(rng):
    """Fixed stage-3 inputs: CFG pair, 256-sq latents + 77-token text."""
    return {
        "dit_latents": rng.normal(size=(1, 32, 32, 16)).astype(np.float32),
        "dit_txt": rng.normal(size=(2, 77, 3584)).astype(np.float32) * 0.1,
        "dit_t": np.asarray([0.5, 0.5], np.float32),
    }


def capture(args):
    import torch

    sys.path.insert(0, args.reference_path)
    rng = np.random.default_rng(0)
    out = {}

    from physicedit_tpu.io.safetensors_io import load_state_dict

    # --- VAE round trip -------------------------------------------------
    if args.vae_path:
        img = rng.uniform(-1, 1, (1, 3, 1024, 1024)).astype(np.float32)
        out["vae_input"] = img
        try:
            from diffsynth.models.qwen_image_vae import QwenImageVAE  # noqa: PLC0415

            vae_sd = load_state_dict(args.vae_path)
            vae = QwenImageVAE()
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

    # --- DiT: one CFG forward --------------------------------------------
    if args.dit_path:
        out.update(_dit_inputs(rng))
        try:
            from diffsynth.models.qwen_image_dit import QwenImageDiT  # noqa: PLC0415

            dit_sd = load_state_dict(args.dit_path)
            dit = QwenImageDiT()
            dit.load_state_dict({k: torch.tensor(np.asarray(v))
                                 for k, v in dit_sd.items()})
            dit = dit.eval()
            lat = torch.tensor(out["dit_latents"].transpose(0, 3, 1, 2))
            lat = lat.repeat(2, 1, 1, 1)
            with torch.no_grad():
                v = dit(latents=lat,
                        timestep=torch.tensor(out["dit_t"]) * 1000,
                        prompt_emb=torch.tensor(out["dit_txt"]),
                        prompt_emb_mask=torch.ones(2, 77, dtype=torch.bool),
                        height=256, width=256)
            out["dit_out_ref"] = v.numpy()
        except Exception as e:  # noqa: BLE001 — signature drift tolerated
            print(f"[capture] reference DiT forward failed ({e}); inputs only")

    # --- VL text encoder hidden states -----------------------------------
    if args.text_encoder_path:
        prompt = "Describe the physical change: the glass tips over."
        out["vl_prompt"] = np.frombuffer(prompt.encode(), np.uint8)
        try:
            from transformers import AutoProcessor, Qwen2_5_VLForConditionalGeneration  # noqa: PLC0415

            proc = AutoProcessor.from_pretrained(args.text_encoder_path)
            model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
                args.text_encoder_path, torch_dtype=torch.float32)
            ids = proc.tokenizer(prompt, return_tensors="pt").input_ids
            with torch.no_grad():
                hid = model.model(input_ids=ids,
                                  output_hidden_states=True).hidden_states[-1]
            out["vl_ids"] = ids.numpy()
            out["vl_hidden_ref"] = hid.numpy()
        except Exception as e:  # noqa: BLE001
            print(f"[capture] HF VL encoder failed ({e}); prompt only")

    # --- DINOv2 features --------------------------------------------------
    if args.dino_path:
        img = rng.uniform(0, 1, (1, 3, 512, 512)).astype(np.float32)
        out["dino_input"] = img
        try:
            from transformers import AutoModel  # noqa: PLC0415

            model = AutoModel.from_pretrained(args.dino_path,
                                              torch_dtype=torch.float32)
            with torch.no_grad():
                feats = model(pixel_values=torch.tensor(img)).last_hidden_state
            out["dino_feats_ref"] = feats.numpy()
        except Exception as e:  # noqa: BLE001
            print(f"[capture] HF DINOv2 failed ({e}); input only")

    np.savez_compressed(args.out, **out)
    print(f"[capture] wrote {args.out} ({list(out)})")


def _report(name, got, ref):
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    denom = float(np.abs(ref).max()) or 1.0
    psnr = 20 * np.log10(denom / (np.sqrt((err ** 2).mean()) + 1e-12))
    print(f"[compare] {name}: max {err.max():.4e} mean {err.mean():.4e} "
          f"PSNR {psnr:.1f} dB")


def compare(args):
    import jax
    import jax.numpy as jnp

    from physicedit_tpu.io.safetensors_io import load_state_dict

    goldens = np.load(args.goldens)

    if args.vae_path and "vae_input" in goldens:
        from physicedit_tpu.io.convert import vae_from_torch
        from physicedit_tpu.models import vae as jvae

        vae_params = vae_from_torch(load_state_dict(args.vae_path),
                                    dtype=jnp.float32)
        img = goldens["vae_input"]
        z = jvae.encode(vae_params, jnp.asarray(img.transpose(0, 2, 3, 1)))
        rec = jvae.decode(vae_params, z)
        if "vae_latent_ref" in goldens:
            _report("VAE latent", np.asarray(z).transpose(0, 3, 1, 2),
                    goldens["vae_latent_ref"])
        print(f"[compare] VAE reconstruction: mean abs "
              f"{np.abs(np.asarray(rec).transpose(0,3,1,2) - img).mean():.4f}")
        if "vae_recon_ref" in goldens:
            ours = np.asarray(rec).transpose(0, 3, 1, 2)
            _report("VAE recon vs reference", ours, goldens["vae_recon_ref"])
            try:
                from physicedit_tpu.eval.metrics import lpips  # noqa: PLC0415

                val = lpips(ours[0].transpose(1, 2, 0),
                            goldens["vae_recon_ref"][0].transpose(1, 2, 0))
                print(f"[compare] LPIPS(ours, reference recon): {val:.4f}")
            except Exception as e:  # noqa: BLE001
                print(f"[compare] LPIPS unavailable: {e}")

    if args.dit_path and "dit_latents" in goldens:
        from physicedit_tpu.io.convert import dit_from_torch
        from physicedit_tpu.models import dit as jdit
        from physicedit_tpu.ops import rope as jrope
        from physicedit_tpu.ops.patchify import patchify, unpatchify

        params = dit_from_torch(load_state_dict(args.dit_path),
                                dtype=jnp.float32)
        cfg = jdit.QWEN_IMAGE_CONFIG
        lat = jnp.asarray(goldens["dit_latents"])
        tokens = patchify(lat)
        tokens = jnp.concatenate([tokens, tokens], 0)
        ic, isn, tc, ts = map(jnp.asarray, jrope.build_rope_tables(
            [(1, 16, 16)], 77))
        outv = jdit.dit_forward(params, cfg, tokens,
                                jnp.asarray(goldens["dit_txt"]),
                                jnp.asarray(goldens["dit_t"]), ic, isn, tc, ts)
        ours = np.asarray(unpatchify(outv, 32, 32))
        if "dit_out_ref" in goldens:
            _report("DiT CFG step", ours.transpose(0, 3, 1, 2),
                    goldens["dit_out_ref"])
        if getattr(args, "quantize", None):
            # int4-vs-bf16 output delta on REAL weights (the quality bound
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
            oq = np.asarray(unpatchify(outq.astype(jnp.float32), 32, 32))
            _report(f"DiT {args.quantize} vs fp32 (quant quality delta)",
                    oq, ours)
            if "dit_out_ref" in goldens:
                _report(f"DiT {args.quantize} vs reference",
                        oq.transpose(0, 3, 1, 2), goldens["dit_out_ref"])

    if args.text_encoder_path and "vl_ids" in goldens:
        from physicedit_tpu.io.convert import qwen_vl_text_from_torch
        from physicedit_tpu.models import qwen_vl as m

        params = qwen_vl_text_from_torch(
            load_state_dict(args.text_encoder_path), dtype=jnp.float32)
        ids = jnp.asarray(goldens["vl_ids"])
        pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None, None],
                               (3, 1, ids.shape[1]))
        emb = m.embed_tokens(params, ids)
        hid = m.text_forward(params, m.QWEN25_VL_7B_TEXT, emb, pos,
                             jnp.ones(ids.shape, bool))
        if "vl_hidden_ref" in goldens:
            _report("VL hidden", np.asarray(hid), goldens["vl_hidden_ref"])

    if args.dino_path and "dino_input" in goldens:
        from physicedit_tpu.io.convert import dinov2_from_torch
        from physicedit_tpu.models import dinov2 as jdino

        params = dinov2_from_torch(load_state_dict(args.dino_path),
                                   dtype=jnp.float32)
        feats = jdino.dinov2_features(
            params, jdino.DinoV2Config(),
            jnp.asarray(goldens["dino_input"].transpose(0, 2, 3, 1)))
        if "dino_feats_ref" in goldens:
            _report("DINOv2 features", np.asarray(feats),
                    goldens["dino_feats_ref"])


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("capture", "compare"):
        sp = sub.add_parser(name)
        sp.add_argument("--vae_path", default=None)
        sp.add_argument("--dit_path", default=None)
        sp.add_argument("--text_encoder_path", default=None)
        sp.add_argument("--dino_path", default=None)
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
    args = p.parse_args(argv)
    (capture if args.cmd == "capture" else compare)(args)


if __name__ == "__main__":
    main()
