"""Single-image edit CLI — the north-star entry point.

Mirrors scripts/inference/validate.py's flags and behaviour:
  --prompt --image_path --save_path --base_model_path --dinov2_path
  --lora_path --seed --num_inference_steps
Input is resized to ~1024-square area rounded to /32 (validate.py:20-31),
the finetuned checkpoint is split into DiT-LoRA (merged) + pipeline
adapters (validate.py:33-65), and the edit runs at the resized size.
"""

from __future__ import annotations

import argparse
import glob
import math
import os


def resize_image(image, target_area: int = 1024 * 1024):
    """~1024-sq /32-rounded resize (validate.py:20-31)."""
    width = math.sqrt(target_area * image.size[0] / image.size[1])
    height = width / (image.size[0] / image.size[1])
    width = round(width / 32) * 32
    height = round(height / 32) * 32
    return image.resize((int(width), int(height)))


def find_model_files(base: str) -> list:
    """Locate the three model families inside a Qwen-Image-Edit layout."""
    patterns = [
        "transformer/diffusion_pytorch_model*.safetensors",
        "text_encoder/model*.safetensors",
        "vae/diffusion_pytorch_model.safetensors",
    ]
    paths = []
    for sub in ("Qwen/Qwen-Image-Edit-2509", "Qwen/Qwen-Image", ""):
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(base, sub, pat)))
            if hits:
                paths.append(hits if len(hits) > 1 else hits[0])
    if not paths:
        # fall back to any safetensors under base
        paths = sorted(glob.glob(os.path.join(base, "**/*.safetensors"),
                                 recursive=True))
    return paths


def main(argv=None):
    from PIL import Image

    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from physicedit_tpu.ops.attention import default_impl

    parser = argparse.ArgumentParser(
        description="Single-image physics-aware edit (TPU)")
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base_model_path", type=str, required=True,
                        help="Folder containing the Qwen-Image-Edit-2509 "
                             "transformer/text_encoder/vae safetensors")
    parser.add_argument("--dinov2_path", type=str, default=None,
                        help="DINOv2 path (train-time prior; optional here)")
    parser.add_argument("--lora_path", type=str, default=None,
                        help="Finetuned PhysicEdit checkpoint (.safetensors)")
    parser.add_argument("--tokenizer_path", type=str, default=None,
                        help="Tokenizer folder (defaults to base/tokenizer)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_inference_steps", type=int, default=40)
    parser.add_argument("--cfg_scale", type=float, default=4.0)
    parser.add_argument("--no_text_reasoning", action="store_true")
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["xla", "pallas"])
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8", "int4"],
                        help="int4: whole pipeline resident on one 16GB "
                             "chip (docs/SERVING.md); int8: W8A8")
    args = parser.parse_args(argv)

    tokenizer_path = args.tokenizer_path or os.path.join(
        args.base_model_path, "tokenizer")
    pipe = PhysicEditPipeline.from_pretrained(
        find_model_files(args.base_model_path),
        tokenizer_path=tokenizer_path if os.path.isdir(tokenizer_path) else None,
        attn_impl=args.attn_impl or default_impl(),
        finetuned_path=args.lora_path, quantize=args.quantize)

    image = resize_image(Image.open(args.image_path).convert("RGB"))
    out = pipe(
        args.prompt, edit_image=image, seed=args.seed,
        num_inference_steps=args.num_inference_steps,
        cfg_scale=args.cfg_scale,
        height=image.size[1], width=image.size[0],
        have_text_reasoning=not args.no_text_reasoning)
    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    out.save(args.save_path)
    print(f"[DONE] saved {args.save_path}")


if __name__ == "__main__":
    main()
