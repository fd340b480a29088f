"""Checkpoint save/resume with reference-format interop.

Reference behaviour being reproduced (SURVEY.md section 5.4):
- SAVE: trainable-params-only safetensors every N steps / epoch end, DiT
  LoRA keys exported with the `pipe.dit.` prefix stripped at load time,
  adapter keys under `pipe.*` (train_physicedit.py:171-186,612-636),
- each checkpoint gets a JSON metadata sidecar {global_step, epoch,
  num_processes, batches_per_epoch, gradient_accumulation_steps, timestamp}
  plus a `latest.json` pointer,
- RESUME: weights-only, strict=False; start epoch / skip-steps inferred
  from metadata, rescaled if the world size changed; optimizer state is NOT
  restored (train_physicedit.py:563-599 — full state resume is explicitly
  disabled there).

Native pytree checkpoints additionally go through Orbax (fast, sharded,
restartable) — the safetensors export exists for interop with reference
checkpoints and external tools.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
import jax

from physicedit_tpu import lora as jlora


# ---------------------------------------------------------------------------
# Reference-format safetensors export of the trainable surface
# ---------------------------------------------------------------------------

def _lin_out(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"], np.float32).T
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _ln_out(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
    sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def export_adapters_state_dict(adapters: dict, prefix: str = "pipe.") -> dict:
    """Adapter pytrees -> reference `pipe.*` torch key space (inverse of
    io/convert.physic_adapters_from_state_dict)."""
    sd: dict = {}
    va = adapters.get("visual_thinking_adapter")
    if va is not None:
        for head in ("head_dino", "head_vae"):
            _lin_out(sd, f"{prefix}visual_thinking_adapter.{head}.0", va[head]["fc1"])
            _lin_out(sd, f"{prefix}visual_thinking_adapter.{head}.2", va[head]["fc2"])
    for name in ("dino_resampler", "vae_resampler"):
        r = adapters.get(name)
        if r is not None:
            base = prefix + name
            sd[base + ".latents"] = np.asarray(r["latents"], np.float32)
            sd[base + ".pos_emb.weight"] = np.asarray(r["pos_emb"], np.float32)
            for i, layer in enumerate(r["layers"]):
                a = f"{base}.layers.{i}.0"
                _ln_out(sd, a + ".norm_media", layer["attn"]["norm_media"])
                _ln_out(sd, a + ".norm_latents", layer["attn"]["norm_latents"])
                for nm in ("to_q", "to_kv", "to_out"):
                    sd[f"{a}.{nm}.weight"] = np.asarray(
                        layer["attn"][nm]["w"], np.float32).T
                f = f"{base}.layers.{i}.1"
                _ln_out(sd, f + ".net.0", layer["ff"]["norm"])
                _lin_out(sd, f + ".net.1", layer["ff"]["fc1"])
                _lin_out(sd, f + ".net.3", layer["ff"]["fc2"])
            _ln_out(sd, base + ".norm", r["norm"])
        ad = adapters.get(name + "_adapter")
        if ad is not None:
            _lin_out(sd, f"{prefix}{name}_adapter.net.0", ad["fc1"])
            _lin_out(sd, f"{prefix}{name}_adapter.net.2", ad["fc2"])
    for name in ("dino_time_embed", "vae_time_embed"):
        te = adapters.get(name)
        if te is not None:
            sd[f"{prefix}{name}.weight"] = np.asarray(te, np.float32)
    return sd


def export_trainable_state_dict(trainable: dict) -> dict:
    """{'lora': ..., 'adapters': ...} -> one reference-format state dict.

    LoRA keys keep NO prefix (the reference strips `pipe.dit.` at save time
    via --remove_prefix_in_ckpt, train_physicedit.py:441-443); adapter keys
    keep `pipe.`.
    """
    sd = {}
    if trainable.get("lora") is not None:
        sd.update(jlora.export_dit_lora(trainable["lora"], prefix=""))
    if trainable.get("adapters"):
        sd.update(export_adapters_state_dict(trainable["adapters"]))
    return sd


def save_safetensors(sd: dict, path: str):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# Checkpoint directory management (metadata sidecars + latest pointer)
# ---------------------------------------------------------------------------

def save_checkpoint(output_dir: str, trainable: dict, global_step: int,
                    epoch: int, num_processes: int = 1,
                    batches_per_epoch: int = 0,
                    gradient_accumulation_steps: int = 1,
                    use_orbax: bool = True,
                    sample_index: int | None = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    name = f"step-{global_step}"
    ckpt_path = os.path.join(output_dir, name + ".safetensors")
    save_safetensors(export_trainable_state_dict(trainable), ckpt_path)

    meta = {
        "global_step": global_step,
        "epoch": epoch,
        "num_processes": num_processes,
        "batches_per_epoch": batches_per_epoch,
        "gradient_accumulation_steps": gradient_accumulation_steps,
        "timestamp": datetime.datetime.now().isoformat(),
    }
    if sample_index is not None:
        # exact dataset position within `epoch` (indices consumed so far) —
        # resume prefers this over the steps-per-epoch heuristic, which
        # drifts when samples are skipped or a partial batch is pending
        meta["sample_index"] = int(sample_index)
    with open(os.path.join(output_dir, name + ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(output_dir, "latest.json"), "w") as f:
        json.dump({"checkpoint": name + ".safetensors", **meta}, f, indent=2)

    if use_orbax:
        try:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(output_dir, name + ".orbax"))
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, jax.tree_util.tree_map(np.asarray, trainable))
            ckptr.wait_until_finished()
        except Exception as e:  # noqa: BLE001 — safetensors export already succeeded
            print(f"[ckpt] orbax save skipped: {e}")
    return ckpt_path


def resolve_resume(resume_from: str) -> tuple[str, dict]:
    """File or directory (with latest.json) -> (checkpoint path, metadata)."""
    if os.path.isdir(resume_from):
        latest = os.path.join(resume_from, "latest.json")
        with open(latest) as f:
            meta = json.load(f)
        return os.path.join(resume_from, meta["checkpoint"]), meta
    meta_path = os.path.splitext(resume_from)[0] + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return resume_from, meta


def resume_position(meta: dict, num_processes: int,
                    batches_per_epoch: int) -> tuple[int, int, int]:
    """(global_step, start_epoch, skip_batches) from sidecar metadata,
    rescaled if the world size changed (train_physicedit.py:563-599)."""
    step = int(meta.get("global_step", 0))
    old_np = int(meta.get("num_processes", num_processes)) or 1
    eff_step = step * old_np // max(num_processes, 1)
    if batches_per_epoch <= 0:
        return step, int(meta.get("epoch", 0)), 0
    start_epoch = eff_step // batches_per_epoch
    skip = eff_step % batches_per_epoch
    return step, start_epoch, skip
