"""Shared TPU serving flags for the sweep CLIs.

Surfaces the measured-best serving configuration (BASELINE config #5) from
one CLI invocation — batched same-resolution denoise (``--batch_size``),
quantized single-chip residency (``--quantize``), and mesh sharding
(``--data_parallel`` x ``--model_parallel`` -> ``pipe.shard``) — plus the
injectable prompt rewriter hook (the reference ships an optional external
GPT-4o-mini rewriter, scripts/inference/inference_pica.py:29-122; here the
rewriter is any executable via ``--prompt_rewriter_cmd``, keeping external
APIs out of the framework).
"""

from __future__ import annotations

import argparse
import os


def add_serving_args(p: argparse.ArgumentParser,
                     with_rewriter: bool = False) -> None:
    g = p.add_argument_group("TPU serving")
    g.add_argument("--batch_size", type=int, default=1,
                   help="Batch same-resolution edits into one denoise "
                        "invocation + one batched reasoner call "
                        "(eval/sweep.BucketBatcher; measured-best serving "
                        "mode in BASELINE.md)")
    g.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int4"],
                   help="int4: whole pipeline resident on one 16GB chip "
                        "(docs/SERVING.md); int8: W8A8")
    g.add_argument("--data_parallel", type=int, default=1,
                   help="Mesh data axis size (batch sharding)")
    g.add_argument("--model_parallel", type=int, default=1,
                   help="Mesh model axis size (tensor-parallel bf16 DiT/VL; "
                        "mutually exclusive with --quantize)")
    g.add_argument("--attn_impl", type=str, default=None,
                   choices=["xla", "pallas"])
    g.add_argument("--cfg_truncate_step", type=int, default=None,
                   help="Guidance-interval accelerator: run CFG only for "
                        "the first K steps, positives-only after (late "
                        "steps cost ~half; standard CFG-interval "
                        "practice). K=30 is the production serving config "
                        "(divergence-qualified, BASELINE.md round-5 "
                        "addendum; the headline number). K=0 is "
                        "positives-only throughout; negative K errors. "
                        "Default off = reference-exact CFG at every step")
    if with_rewriter:
        g.add_argument("--prompt_rewriter_cmd", type=str, default=None,
                       help="Executable that reads a prompt on stdin and "
                            "writes the rewritten prompt to stdout (the "
                            "injectable replacement for the reference's "
                            "GPT-4o-mini rewriter, inference_pica.py:29-122)")
        g.add_argument("--prompt_refiner", type=str, default=None,
                       help="kind:/model/path in-process prompt refiner "
                            "(kind: beautiful | qwen | translate — the "
                            "reference's BeautifulPrompt / QwenPrompt / "
                            "Translator, prompt_refiners.py:6-130); runs "
                            "before --prompt_rewriter_cmd")


def make_prompt_rewriter(cmd: str | None):
    """Wrap a shell command as a prompt -> prompt callable.

    The command receives the prompt on stdin and must print the rewritten
    prompt to stdout.  A non-zero exit or empty output falls back to the
    original prompt (the reference's rewriter retries, then keeps the
    original on persistent failure, inference_pica.py:92-122).
    """
    if cmd is None:
        return None
    import shlex
    import subprocess

    argv = shlex.split(cmd)

    def rewrite(prompt: str) -> str:
        try:
            proc = subprocess.run(argv, input=prompt, capture_output=True,
                                  text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:
            print(f"[rewriter] failed ({e}); keeping original prompt",
                  flush=True)
            return prompt
        out = proc.stdout.strip()
        if proc.returncode != 0 or not out:
            print(f"[rewriter] rc={proc.returncode}; keeping original prompt",
                  flush=True)
            return prompt
        return out

    return rewrite


def make_prompt_preprocessor(args):
    """Compose --prompt_refiner (in-process model) with
    --prompt_rewriter_cmd (external executable) into one prompt -> prompt
    callable for eval/sweep.py's ``prompt_rewriter`` seam; None if neither
    flag was given."""
    from physicedit_tpu.pipeline.prompt_refiners import make_prompt_refiner

    stages = [f for f in (make_prompt_refiner(
        getattr(args, "prompt_refiner", None)),
        make_prompt_rewriter(getattr(args, "prompt_rewriter_cmd", None)))
        if f is not None]
    if not stages:
        return None
    if len(stages) == 1:
        return stages[0]

    def chain(prompt: str) -> str:
        for f in stages:
            prompt = f(prompt)
        return prompt

    return chain


def build_pipeline(args) -> "object":
    """Construct (and optionally quantize / mesh-shard) the pipeline from
    the parsed serving args."""
    from physicedit_tpu.cli.validate import find_model_files
    from physicedit_tpu.ops.attention import default_impl
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline

    n_mesh = args.data_parallel * args.model_parallel
    if n_mesh > 1 and args.quantize:
        raise SystemExit(
            "--quantize and --data_parallel/--model_parallel are alternative "
            "memory strategies (quantized single-chip residency vs bf16 "
            "tensor parallelism, docs/SERVING.md); pick one")

    tokenizer_path = args.tokenizer_path or os.path.join(
        args.base_model_path, "tokenizer")
    pipe = PhysicEditPipeline.from_pretrained(
        find_model_files(args.base_model_path),
        tokenizer_path=tokenizer_path if os.path.isdir(tokenizer_path) else None,
        attn_impl=args.attn_impl or default_impl(),
        finetuned_path=args.lora_path, quantize=args.quantize)

    if n_mesh > 1:
        import jax

        from physicedit_tpu.parallel import sharding as sh

        if len(jax.devices()) < n_mesh:
            raise SystemExit(
                f"mesh {args.data_parallel}x{args.model_parallel} needs "
                f"{n_mesh} devices, found {len(jax.devices())}")
        mesh = sh.create_mesh(args.data_parallel, args.model_parallel)
        pipe.shard(mesh)
    return pipe
