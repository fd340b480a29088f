"""PICABench sweep CLI (mirrors scripts/inference/inference_pica.py flags).

Multi-worker sharding follows the reference convention: each worker owns a
disjoint [--start_idx, --end_idx) range (inference_pica.py:217-220).  The
TPU serving modes — batched same-resolution denoise, quantized single-chip
residency, mesh sharding, injectable prompt rewriter — are exposed via the
shared serving flags (cli/serving.py), so the measured-best configuration
(BASELINE config #5: ``--batch_size 8 --quantize int4``) is reproducible
from one invocation.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from physicedit_tpu.cli.serving import (add_serving_args, build_pipeline,
                                            make_prompt_preprocessor)
    from physicedit_tpu.eval.sweep import run_pica_sweep

    p = argparse.ArgumentParser()
    p.add_argument("--base_model_path", type=str, required=True)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--prompt_type", type=str, default="intermediate",
                   choices=["superficial", "intermediate", "explicit"])
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_inference_steps", type=int, default=40)
    p.add_argument("--local_dataset_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    add_serving_args(p, with_rewriter=True)
    args = p.parse_args(argv)

    pipe = build_pipeline(args)
    run_pica_sweep(pipe, args.output_dir, prompt_type=args.prompt_type,
                   start_idx=args.start_idx, end_idx=args.end_idx,
                   seed=args.seed, num_inference_steps=args.num_inference_steps,
                   local_dataset_path=args.local_dataset_path,
                   prompt_rewriter=make_prompt_preprocessor(args),
                   batch_size=args.batch_size,
                   cfg_truncate_step=args.cfg_truncate_step)


if __name__ == "__main__":
    main()
