"""LoRA subsystem: offline merge, finetuned-checkpoint splitting, trainable
factors, and reference-format export.

Covers the reference's LoRA surfaces (SURVEY.md R6):
- offline merge `W += alpha * B @ A` with module names derived by stripping
  `lora_A/B.{default.}weight` (diffsynth/lora/__init__.py:5-45),
- the finetuned-checkpoint split used at inference: DiT-LoRA keys vs
  `pipe.*` adapter keys (scripts/inference/validate.py:33-65),
- training keeps (A, B) as separate pytree leaves applied on activations
  (`y += (x @ A) @ B`), exported in peft's `lora_X.default.weight` format
  with `pipe.dit.` prefixes for drop-in interop with reference checkpoints
  (reference exports lora_alpha == rank so the scale is 1 —
  trainers/utils.py:799-802, scripts/train/train_multigpu.sh:31).
"""

from __future__ import annotations

import re

import numpy as np
import jax
import jax.numpy as jnp

# The 12 DiT module types the reference trains (train_multigpu.sh:30).
DEFAULT_TARGETS = (
    "to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj",
    "to_out.0", "to_add_out", "img_mlp.net.2", "img_mod.1",
    "txt_mlp.net.2", "txt_mod.1",
)

_LORA_RE = re.compile(r"^(.*)\.lora_([AB])(?:\.default)?\.weight$")


def collect_lora_pairs(lora_sd: dict) -> dict:
    """{module_name: {'A': [r, in], 'B': [out, r]}} from a LoRA state dict.

    Strips an optional leading ``diffusion_model.`` the way the reference's
    GeneralLoRALoader.get_name_dict does (diffsynth/lora/__init__.py:20-21),
    so community "opensource-format" LoRA files load unchanged.
    """
    pairs: dict = {}
    for k, v in lora_sd.items():
        m = _LORA_RE.match(k)
        if m:
            name = m.group(1)
            if name.startswith("diffusion_model."):
                name = name[len("diffusion_model."):]
            pairs.setdefault(name, {})[m.group(2)] = np.asarray(
                v, dtype=np.float32)
    return {k: v for k, v in pairs.items() if "A" in v and "B" in v}


def merge_lora_into_state_dict(sd: dict, lora_sd: dict, alpha: float = 1.0) -> dict:
    """Return sd with `weight += alpha * B @ A` applied per matched module.

    Operates on the torch-format (out, in) weights *before* conversion to
    the framework pytree, so a single code path serves every model family.
    """
    pairs = collect_lora_pairs(lora_sd)
    out = dict(sd)
    merged = 0
    for name, ab in pairs.items():
        wkey = name + ".weight"
        if wkey not in out:
            continue
        w = np.asarray(out[wkey], dtype=np.float32)
        out[wkey] = w + alpha * (ab["B"] @ ab["A"])
        merged += 1
    if merged != len(pairs):
        missing = [n for n in pairs if n + ".weight" not in sd]
        raise KeyError(f"LoRA modules not found in base weights: {missing[:5]}...")
    return out


def split_finetuned_checkpoint(sd: dict) -> tuple[dict, dict]:
    """Split a PhysicEdit training export into (dit_lora_sd, pipeline_sd).

    Exact validate.py:44-65 semantics: keys containing `lora_A`/`lora_B`
    target the DiT; of the rest, `pipe.*` keys are adapter/resampler
    weights (prefix stripped here) and anything else is DROPPED (the
    reference's `else: continue`) — with a warning, since a dropped key
    in a real checkpoint would mean converter drift.
    """
    import warnings

    lora_sd, pipe_sd = {}, {}
    dropped = []
    for k, v in sd.items():
        if "lora_A" in k or "lora_B" in k:
            lora_sd[k] = v
        elif k.startswith("pipe."):
            pipe_sd[k[len("pipe."):]] = v
        else:
            dropped.append(k)
    if dropped:
        warnings.warn(
            f"finetuned checkpoint: dropped {len(dropped)} keys that are "
            f"neither LoRA nor pipe.* (validate.py:55-61 drops these too); "
            f"first: {dropped[:3]}", stacklevel=2)
    return lora_sd, pipe_sd


# ---------------------------------------------------------------------------
# Trainable LoRA factors over the framework's fused-projection pytree
# ---------------------------------------------------------------------------

# Mapping: framework block path -> (reference module names, fused parts)
_FUSED = {
    "img_qkv": ("attn.to_q", "attn.to_k", "attn.to_v"),
    "txt_qkv": ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"),
}
_PLAIN = {
    "to_out": "attn.to_out.0",
    "to_add_out": "attn.to_add_out",
    "img_mlp_fc2": "img_mlp.net.2",
    "txt_mlp_fc2": "txt_mlp.net.2",
    "img_mod": "img_mod.1",
    "txt_mod": "txt_mod.1",
}


def init_dit_lora(key, cfg, rank: int = 128, dtype=jnp.float32):
    """Trainable LoRA pytree for the DiT (stacked along the layer axis).

    A ~ N(0, 1/r) Kaiming-style; B = 0 (peft convention: delta starts at 0).
    """
    L, d = cfg.num_layers, cfg.dim
    dims = {
        "img_qkv": [(d, d)] * 3,
        "txt_qkv": [(d, d)] * 3,
        "to_out": (d, d),
        "to_add_out": (d, d),
        "img_mlp_fc2": (cfg.mlp_dim, d),
        "txt_mlp_fc2": (cfg.mlp_dim, d),
        "img_mod": (d, 6 * d),
        "txt_mod": (d, 6 * d),
    }
    ks = iter(jax.random.split(key, 16))
    lora = {}
    for name, shape in dims.items():
        if isinstance(shape, list):
            ins = shape[0][0]
            # NB: scale by a weak Python float — a NumPy scalar would
            # promote bf16 A-factors to fp32 and silently defeat `dtype`
            lora[name] = {
                "A": jax.random.normal(next(ks), (L, 3, ins, rank), dtype)
                * float(1.0 / np.sqrt(ins)),
                "B": jnp.zeros((L, 3, rank, shape[0][1]), dtype),
            }
        else:
            ins, outs = shape
            lora[name] = {
                "A": jax.random.normal(next(ks), (L, ins, rank), dtype)
                * float(1.0 / np.sqrt(ins)),
                "B": jnp.zeros((L, rank, outs), dtype),
            }
    return lora


def lora_delta_fused(lora_leaf, x):
    """x: [B, S, in]; A: [3, in, r], B: [3, r, out] -> [B, S, 3*out]."""
    t = jnp.einsum("bsi,pir->bspr", x, lora_leaf["A"])
    d = jnp.einsum("bspr,pro->bspo", t, lora_leaf["B"])
    b, s = x.shape[:2]
    return d.reshape(b, s, -1)


def lora_delta(lora_leaf, x):
    """x: [B, S, in]; A: [in, r], B: [r, out] -> [B, S, out]."""
    return (x @ lora_leaf["A"]) @ lora_leaf["B"]


def export_dit_lora(lora, prefix: str = "pipe.dit.") -> dict:
    """Trainable factors -> reference peft key format (numpy, torch layout).

    Keys: {prefix}transformer_blocks.{i}.{module}.lora_{A,B}.default.weight
    with A [r, in], B [out, r] (torch layout: transposed from ours).
    """
    out = {}
    L = lora["to_out"]["A"].shape[0]

    def put(i, module, A, B):
        out[f"{prefix}transformer_blocks.{i}.{module}.lora_A.default.weight"] = (
            np.asarray(A, np.float32).T)
        out[f"{prefix}transformer_blocks.{i}.{module}.lora_B.default.weight"] = (
            np.asarray(B, np.float32).T)

    for i in range(L):
        for name, modules in _FUSED.items():
            for p, module in enumerate(modules):
                put(i, module, lora[name]["A"][i, p], lora[name]["B"][i, p])
        for name, module in _PLAIN.items():
            put(i, module, lora[name]["A"][i], lora[name]["B"][i])
    return out


def import_dit_lora(lora_sd: dict, cfg, dtype=jnp.float32):
    """Reference peft-format LoRA state dict -> trainable factors pytree."""
    pairs = collect_lora_pairs(lora_sd)
    L = cfg.num_layers

    def get(i, module):
        for cand in (f"transformer_blocks.{i}.{module}",
                     f"pipe.dit.transformer_blocks.{i}.{module}"):
            if cand in pairs:
                ab = pairs[cand]
                return ab["A"].T, ab["B"].T  # -> (in, r), (r, out)
        raise KeyError(f"missing LoRA for layer {i} module {module}")

    lora = {}
    for name, modules in _FUSED.items():
        As, Bs = [], []
        for i in range(L):
            a3, b3 = zip(*[get(i, m) for m in modules])
            As.append(np.stack(a3))
            Bs.append(np.stack(b3))
        lora[name] = {"A": jnp.asarray(np.stack(As), dtype),
                      "B": jnp.asarray(np.stack(Bs), dtype)}
    for name, module in _PLAIN.items():
        a, b = zip(*[get(i, module) for i in range(L)])
        lora[name] = {"A": jnp.asarray(np.stack(a), dtype),
                      "B": jnp.asarray(np.stack(b), dtype)}
    return lora
