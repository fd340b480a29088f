"""Training CLI mirroring the reference's flag surface.

Reference: scripts/train/train_physicedit.py + train_multigpu.sh — dataset
path, resolution, LoRA rank, lr, epochs, checkpoint cadence, resume.  On
TPU there is no `accelerate launch`: the single-controller process drives
the whole mesh; data parallelism comes from the sharded train step.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PhysicEdit-TPU training")
    p.add_argument("--dataset_base_path", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./ckpt")
    p.add_argument("--base_model_path", type=str, required=True)
    p.add_argument("--dinov2_path", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--save_every_n_steps", type=int, default=500)
    p.add_argument("--eval_every_n_steps", type=int, default=None)
    p.add_argument("--dataset_repeat", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1,
                   help="global batch, sharded over the data mesh axis")
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--resume_from", type=str, default=None)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quantize_frozen", choices=("none", "w4"), default="none",
                   help="w4: pack the frozen DiT to int4 so the 20B model "
                        "LoRA-trains on one 16GB chip (the TPU equivalent "
                        "of the reference's single-GPU offload training)")
    p.add_argument("--data_process_output", type=str, default=None,
                   help="run the data-process task instead of training: "
                        "preprocess every sample once and write .npz "
                        "bundles here (reference launch_data_process_task)")
    p.add_argument("--cached_inputs_path", type=str, default=None,
                   help="train from a --data_process_output cache instead "
                        "of raw videos")
    p.add_argument("--optimizer_state_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="Adam moment storage dtype — bfloat16 halves "
                        "optimizer-state HBM for large LoRA ranks")
    p.add_argument("--lora_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "adafactor"),
                   help="adafactor: factored second moment, ~zero "
                        "optimizer-state HBM — fits reference-scale r=128 "
                        "on one 16 GB chip (documented divergence)")
    p.add_argument("--loader_workers", type=int, default=2,
                   help="background dataset-decode threads (the "
                        "reference's DataLoader num_workers, "
                        "train_physicedit.py:512); 0 = synchronous")
    p.add_argument("--adapters_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="adapter master-weight dtype; bfloat16 frees "
                        "~1 GB params+grads (needed for the one-chip "
                        "r=128 mode; float32 is reference-fidelity)")
    return p


def main(argv=None):
    import os

    import jax.numpy as jnp

    from physicedit_tpu.cli.validate import find_model_files
    from physicedit_tpu.io.convert import dinov2_from_torch
    from physicedit_tpu.io.safetensors_io import load_state_dict
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    from physicedit_tpu.train.dataset import PhysicTranDataset
    from physicedit_tpu.train.logging_utils import TrainLogger
    from physicedit_tpu.train.trainer import TrainConfig, Trainer

    args = build_parser().parse_args(argv)

    tokenizer_path = args.tokenizer_path or os.path.join(
        args.base_model_path, "tokenizer")
    pipe = PhysicEditPipeline.from_pretrained(
        find_model_files(args.base_model_path),
        tokenizer_path=tokenizer_path if os.path.isdir(tokenizer_path) else None)
    pipe.dinov2_params = dinov2_from_torch(
        load_state_dict(args.dinov2_path), dtype=jnp.float32)

    if args.cached_inputs_path:
        from physicedit_tpu.train.dataset import CachedPreprocessedDataset

        dataset = CachedPreprocessedDataset(args.cached_inputs_path,
                                            repeat=args.dataset_repeat)
    else:
        dataset = PhysicTranDataset(
            args.dataset_base_path, num_frames=args.num_frames,
            height=args.height, width=args.width, repeat=args.dataset_repeat)

    cfg = TrainConfig(
        output_path=args.output_path, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, num_epochs=args.num_epochs,
        lora_rank=args.lora_rank, save_every_n_steps=args.save_every_n_steps,
        eval_every_n_steps=args.eval_every_n_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        batch_size=args.batch_size,
        height=args.height, width=args.width, seed=args.seed,
        quantize_frozen=args.quantize_frozen,
        cached_inputs=args.cached_inputs_path is not None,
        optimizer_state_dtype=args.optimizer_state_dtype,
        lora_dtype=args.lora_dtype,
        optimizer=args.optimizer,
        adapters_dtype=args.adapters_dtype,
        loader_workers=args.loader_workers)

    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        from physicedit_tpu.parallel.sharding import create_mesh

        mesh = create_mesh(args.data_parallel, args.model_parallel)

    trainer = Trainer(pipe, dataset, cfg, logger=TrainLogger(args.use_wandb),
                      mesh=mesh)
    if args.data_process_output:
        trainer.cache_preprocessed(args.data_process_output)
        return
    if args.resume_from:
        trainer.resume(args.resume_from)
    trainer.train()


if __name__ == "__main__":
    main()
