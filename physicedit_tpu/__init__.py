"""PhysicEdit-TPU: a TPU-native (JAX/XLA/Pallas) physics-aware image editing framework.

A from-scratch rebuild of the capabilities of liangbingzhao/PhysicEdit
(Qwen-Image-Edit-2509 + latent-transition-prior adapters) designed for TPU:

- compute path: JAX/XLA with Pallas kernels for the hot joint-attention loop
- parallelism: ``jax.sharding.Mesh`` + GSPMD (no NCCL-style explicit collectives)
- models: functional modules over parameter pytrees (fast safetensors loading,
  trivially shardable, jit/scan-friendly)

Package map (mirrors SURVEY.md section 7.1):
    core/      dtype policy, mesh/sharding setup, PRNG discipline, pytree utils
    io/        safetensors -> pytree loaders, hash-based checkpoint detection
    ops/       norms, RoPE, patchify, attention (XLA baseline)
    kernels/   Pallas TPU kernels (fused flash attention, ...)
    models/    dit, vae, qwen2.5-vl, dinov2, adapters, controlnet
    sampling/  flow-match scheduler (pure functions), CFG denoise loop
    pipeline/  the edit pipeline (preprocessing stages, prompt templating)
    lora/      LoRA merge / export (reference-checkpoint interop)
    train/     loss, train step, optimizer, checkpointing
    parallel/  mesh axes and partition specs for multi-chip execution
    eval/      PICABench / KRIS-Bench sweep drivers
    cli/       validate / train entry points mirroring the reference flags
"""

__version__ = "0.1.0"

# Convenience API surface (lazy to keep bare-package import cheap).
_DATA_EXPORTS = (
    # the reference re-exports these from its package root (diffsynth/__init__.py:1)
    "VideoData", "save_video", "save_frames", "merge_video_audio",
    "save_video_with_audio",
)


def __getattr__(name):
    if name in _DATA_EXPORTS:
        from physicedit_tpu import data as _data

        return getattr(_data, name)
    if name == "PhysicEditPipeline":
        from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline

        return PhysicEditPipeline
    if name == "Trainer":
        from physicedit_tpu.train.trainer import Trainer

        return Trainer
    if name == "TrainConfig":
        from physicedit_tpu.train.trainer import TrainConfig

        return TrainConfig
    raise AttributeError(name)


def __dir__():
    return sorted(set(globals()) | set(_DATA_EXPORTS)
                  | {"PhysicEditPipeline", "Trainer", "TrainConfig"})
