"""Inspect a checkpoint: detected architecture, key-space hash, shapes.

Operator convenience mirroring what the reference's ModelManager prints
during loading (model_manager.py:350-416), usable standalone:

  python tools/inspect_checkpoint.py path/to/model.safetensors [...]
"""

from __future__ import annotations

import sys


def describe(path: str):
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from physicedit_tpu.io.safetensors_io import (
        detect_model_name, hash_state_dict_keys, load_state_dict)

    sd = load_state_dict(path)
    name = detect_model_name(sd)
    h = hash_state_dict_keys(sd)
    n_params = sum(int(v.size) for v in sd.values() if hasattr(v, "size"))
    n_bytes = sum(int(v.size) * v.dtype.itemsize for v in sd.values()
                  if hasattr(v, "size"))
    print(f"{path}")
    print(f"  detected: {name or 'UNKNOWN'}")
    print(f"  key hash: {h}")
    print(f"  tensors:  {len(sd)}  params: {n_params / 1e9:.3f}B  "
          f"size: {n_bytes / 1e9:.2f} GB")
    lora_keys = [k for k in sd if "lora_" in k]
    pipe_keys = [k for k in sd if k.startswith("pipe.")]
    if lora_keys or pipe_keys:
        print(f"  finetuned export: {len(lora_keys)} LoRA keys, "
              f"{len(pipe_keys)} pipeline-adapter keys")
    for k in list(sd)[:5]:
        print(f"    {k}: {tuple(sd[k].shape)} {sd[k].dtype}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        describe(p)
