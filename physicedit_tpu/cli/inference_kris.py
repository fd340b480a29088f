"""KRIS-Bench sweep CLI (mirrors scripts/inference/inference_kris.py flags)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from physicedit_tpu.cli.validate import find_model_files
    from physicedit_tpu.eval.sweep import run_kris_sweep
    from physicedit_tpu.ops.attention import default_impl
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline

    p = argparse.ArgumentParser()
    p.add_argument("--base_model_path", type=str, required=True)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_inference_steps", type=int, default=40)
    p.add_argument("--local_dataset_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    args = p.parse_args(argv)

    tokenizer_path = args.tokenizer_path or os.path.join(
        args.base_model_path, "tokenizer")
    pipe = PhysicEditPipeline.from_pretrained(
        find_model_files(args.base_model_path),
        tokenizer_path=tokenizer_path if os.path.isdir(tokenizer_path) else None,
        attn_impl=default_impl(), finetuned_path=args.lora_path)
    run_kris_sweep(pipe, args.output_dir, start_idx=args.start_idx,
                   end_idx=args.end_idx, seed=args.seed,
                   num_inference_steps=args.num_inference_steps,
                   local_dataset_path=args.local_dataset_path)


if __name__ == "__main__":
    main()
