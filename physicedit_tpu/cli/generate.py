"""Text-to-image CLI (the base Qwen-Image generation path, no edit image).

Exercises the pipeline's T2I branch: T2I prompt template with drop_idx 34
(qwen_image_physical.py:762-772), noise-only latents, CFG denoise, decode.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from physicedit_tpu.cli.validate import find_model_files
    from physicedit_tpu.ops.attention import default_impl
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline

    p = argparse.ArgumentParser(description="Text-to-image generation (TPU)")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--base_model_path", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--height", type=int, default=1328)
    p.add_argument("--width", type=int, default=1328)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_inference_steps", type=int, default=40)
    p.add_argument("--cfg_scale", type=float, default=4.0)
    args = p.parse_args(argv)

    tokenizer_path = args.tokenizer_path or os.path.join(
        args.base_model_path, "tokenizer")
    pipe = PhysicEditPipeline.from_pretrained(
        find_model_files(args.base_model_path),
        tokenizer_path=tokenizer_path if os.path.isdir(tokenizer_path) else None,
        attn_impl=default_impl())
    out = pipe(args.prompt, negative_prompt=args.negative_prompt,
               height=args.height, width=args.width, seed=args.seed,
               num_inference_steps=args.num_inference_steps,
               cfg_scale=args.cfg_scale, have_text_reasoning=False)
    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    out.save(args.save_path)
    print(f"[DONE] saved {args.save_path}")


if __name__ == "__main__":
    main()
