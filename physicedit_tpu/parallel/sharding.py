"""Mesh and partition specs: the TPU replacement for the reference's
NCCL/DDP stack (SURVEY.md section 2.5 / 5.8).

The reference scales with torch DDP (gradient all-reduce over NCCL,
train_physicedit.py:517,658) plus a CPU-offload VRAM manager for single-GPU
memory.  On TPU both are replaced by sharding annotations over a
``jax.sharding.Mesh`` with axes:

    data   batch-parallel (the DDP equivalent; GSPMD inserts the grad psum)
    model  tensor-parallel (Megatron-style column/row splits of the DiT's
           QKV / MLP projections — replaces CPU offload as the memory
           strategy for the ~20B-param DiT: bf16 weights ~40GB span chips)

All collectives are chosen by GSPMD and ride ICI; there is no explicit
communication code anywhere in the framework.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _replicated_like(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def dit_param_specs(params) -> dict:
    """PartitionSpecs for the DiT pytree (matches models/dit.py layout).

    Megatron-style tensor parallelism per block (leading axis = layer):
      qkv / fc1 / mod : column-split (output features on `model`)
      to_out / fc2    : row-split (input features on `model`)
    Everything small stays replicated.
    """
    specs = _replicated_like(params)
    col_w = P(None, None, MODEL_AXIS)
    col_b = P(None, MODEL_AXIS)
    row_w = P(None, MODEL_AXIS, None)

    blocks = specs["blocks"]
    for mod in ("img_mod", "txt_mod"):
        blocks[mod]["w"] = col_w
        blocks[mod]["b"] = col_b
    for proj in ("img_qkv", "txt_qkv"):
        blocks["attn"][proj]["w"] = col_w
        blocks["attn"][proj]["b"] = col_b
    for proj in ("to_out", "to_add_out"):
        blocks["attn"][proj]["w"] = row_w
    for mlp in ("img_mlp", "txt_mlp"):
        blocks[mlp]["fc1"]["w"] = col_w
        blocks[mlp]["fc1"]["b"] = col_b
        blocks[mlp]["fc2"]["w"] = row_w
    return specs


def qwen_vl_text_param_specs(params) -> dict:
    """Tensor-parallel specs for the Qwen2.5-VL text decoder (models/qwen_vl.py):
    q/k/v/gate/up column-split, o/down row-split, lm_head column-split,
    embeddings and norms replicated.  Makes the 7B conditioning encoder span
    the `model` axis alongside the DiT."""
    specs = _replicated_like(params)
    col_w, col_b, row_w = P(None, None, MODEL_AXIS), P(None, MODEL_AXIS), \
        P(None, MODEL_AXIS, None)
    layers = specs["layers"]
    for proj in ("q", "k", "v"):
        layers[proj]["w"] = col_w
        layers[proj]["b"] = col_b
    layers["o"]["w"] = row_w
    layers["mlp"]["gate"]["w"] = col_w
    layers["mlp"]["up"]["w"] = col_w
    layers["mlp"]["down"]["w"] = row_w
    specs["lm_head"]["w"] = P(None, MODEL_AXIS)
    return specs


def batch_specs():
    """Activation specs: batch on `data`, everything else replicated."""
    return P(DATA_AXIS)


def shard_params(params, specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
