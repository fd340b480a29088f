"""MEASURED single-chip LoRA train step on the FULL 60-block DiT.

The reference trains on one GPU via its CPU-offload VRAM manager
(scripts/train/train_singlegpu.sh, 80 GB A100).  The TPU answer on a
16 GB v5e: the frozen 20B DiT lives HBM-resident as packed int4
(kernels/quant_matmul.py, differentiable in x via a straight-through
custom VJP) and the trainable LoRA factors + adapters run in fp32, with
per-block rematerialisation and the Pallas fixed-max attention whose
backward is a pair of custom kernels (kernels/flash_attention.py).

Workload: the reference training shape (480x832 image, B=1, joint
sequence = 1560 base + 1560 edit + 256 text tokens), LoRA rank
configurable.  Measured fit ladder on a 15.75 GB chip: r=8 fp32 AdamW;
r=16 needs bf16 Adam moments (fp32 states exceed HBM by ~0.4 GB);
r=32 bf16 moments + bf16 factors; the reference r=128 (~944M trainable)
runs with Adafactor (factored second moment, ~zero state HBM) + bf16
factors.  Results land in TRAIN_DETAIL.json for render_measured.py.

Usage: python tools/train_singlechip.py [--rank 16] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(rank: int = 16, reps: int = 3, num_layers: int = 60,
        attn_impl: str = "pallas", state_dtype: str | None = None,
        lora_dtype: str = "float32", optimizer_name: str = "adamw",
        adapters_dtype: str = "float32"):
    from physicedit_tpu import lora as jlora
    from physicedit_tpu.core.params import random_tree_like, tree_size_bytes
    from physicedit_tpu.kernels.quant_matmul import (DIT_OUTER_KEYS,
                                                     quantize_tree_int4)
    from physicedit_tpu.models import adapters as jad
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.sampling import flow_match as fm
    from physicedit_tpu.train.train_step import make_optimizer, train_step

    cfg = jdit.DiTConfig(num_layers=num_layers)
    # mirrors Trainer(quantize_frozen="w4"): blocks int4, embed/head bf16
    shapes = jax.eval_shape(lambda: quantize_tree_int4(
        jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16),
        skip_top=DIT_OUTER_KEYS))
    t0 = time.perf_counter()
    dit_params = random_tree_like(1, shapes)
    log(f"frozen W4 DiT: {tree_size_bytes(dit_params)/1e9:.2f} GB "
        f"({time.perf_counter()-t0:.0f}s)")

    keys = iter(jax.random.split(jax.random.PRNGKey(1), 16))
    lora = jlora.init_dit_lora(next(keys), cfg, rank=rank,
                               dtype=getattr(jnp, lora_dtype))
    adt = getattr(jnp, adapters_dtype)
    adapters = {
        "visual_thinking_adapter": jad.init_dual_adapter_params(
            next(keys), cfg.txt_in_dim, cfg.txt_in_dim, dtype=adt),
        "dino_resampler": jad.init_perceiver_params(
            next(keys), dim=768, num_latents=64, max_num_media_tokens=1024,
            dtype=adt),
        "dino_resampler_adapter": jad.init_visual_thinking_params(
            next(keys), 768, cfg.txt_in_dim, dtype=adt),
        "dino_time_embed": (jax.random.normal(next(keys), (6, 768)) * 0.02
                            ).astype(adt),
        "vae_resampler": jad.init_perceiver_params(
            next(keys), dim=64, num_latents=64, max_num_media_tokens=2048,
            dtype=adt),
        "vae_resampler_adapter": jad.init_visual_thinking_params(
            next(keys), 64, cfg.txt_in_dim, dtype=adt),
        "vae_time_embed": (jax.random.normal(next(keys), (6, 64)) * 0.02
                           ).astype(adt),
    }
    trainable = {"lora": lora, "adapters": adapters}
    log(f"trainable: {tree_size_bytes(trainable)/1e9:.3f} GB "
        f"(+2x fp32 AdamW states)")

    # reference training shape: 480x832 -> latent 60x104 -> 30x52 grid
    b, lh, lw, s_t, n_special = 1, 60, 104, 256, 64
    gh, gw = lh // 2, lw // 2
    s_img = gh * gw
    rng = np.random.default_rng(0)
    sched = fm.qwen_training_schedule()
    tids = rng.integers(0, 1000, size=(b,))
    img_cos, img_sin, txt_cos, txt_sin = jrope.build_rope_tables(
        [(1, gh, gw), (1, gh, gw)], s_t)
    dtype = jnp.bfloat16
    batch = {
        "input_latents": jnp.asarray(rng.normal(size=(b, lh, lw, 16)) * 0.3, dtype),
        "noise": jnp.asarray(rng.normal(size=(b, lh, lw, 16)), dtype),
        "sigma": jnp.asarray(sched.sigmas[tids], jnp.float32),
        "timestep": jnp.asarray(sched.timesteps[tids], jnp.float32),
        "weight": jnp.asarray(sched.weights[tids], jnp.float32),
        "edit_tokens": jnp.asarray(rng.normal(size=(b, s_img, 64)) * 0.3, dtype),
        "prompt_emb": jnp.asarray(rng.normal(size=(b, s_t, cfg.txt_in_dim)) * 0.1, dtype),
        "txt_mask": jnp.ones((b, s_t), bool),
        "special_idx": jnp.tile(jnp.arange(4, 4 + n_special)[None], (b, 1)),
        "dino_mid_feats": jnp.asarray(rng.normal(size=(b, 2, 256, 768)) * 0.1, dtype),
        "dino_src_feats": jnp.asarray(rng.normal(size=(b, 1, 256, 768)) * 0.1, dtype),
        "vae_mid_tokens": jnp.asarray(rng.normal(size=(b, 2, 390, 64)) * 0.1, dtype),
        "vae_src_tokens": jnp.asarray(rng.normal(size=(b, 1, 390, 64)) * 0.1, dtype),
        "img_cos": jnp.asarray(img_cos), "img_sin": jnp.asarray(img_sin),
        "txt_cos": jnp.asarray(txt_cos), "txt_sin": jnp.asarray(txt_sin),
    }

    optimizer = make_optimizer(
        lr=5e-5,
        state_dtype=None if state_dtype is None else getattr(jnp, state_dtype),
        name=optimizer_name)
    opt_state = optimizer.init(trainable)
    log(f"optimizer={optimizer_name} state: "
        f"{tree_size_bytes(opt_state)/1e9:.3f} GB")
    t_min, t_max = fm.adapter_t_range()
    frozen = {"dit": dit_params}

    t0 = time.perf_counter()
    trainable, opt_state, metrics = train_step(
        trainable, frozen, opt_state, batch, cfg, optimizer, t_min, t_max,
        attn_impl=attn_impl, use_remat=True)
    loss0 = float(metrics["loss"])
    log(f"compile+first step: {time.perf_counter()-t0:.0f}s loss={loss0:.4f}")
    assert np.isfinite(loss0), "non-finite loss"

    best = float("inf")
    for i in range(reps):
        batch["noise"] = batch["noise"] * (1.0 + 0.11 * (i % 3 + 1))
        t0 = time.perf_counter()
        trainable, opt_state, metrics = train_step(
            trainable, frozen, opt_state, batch, cfg, optimizer, t_min, t_max,
            attn_impl=attn_impl, use_remat=True)
        loss = float(metrics["loss"])  # value fetch = honest sync
        best = min(best, time.perf_counter() - t0)
    g = jax.tree_util.tree_leaves(trainable["lora"])[0]
    log(f"MEASURED single-chip LoRA train step (60-block W4 DiT, r={rank}, "
        f"{optimizer_name}): {best:.3f} s/step; loss={loss:.4f}; "
        f"lora updated={bool(jnp.any(g != 0))}")
    if num_layers == 60:  # full-model runs feed the rendered rank ladder
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_DETAIL.json")
        detail = {}
        if os.path.exists(path):
            with open(path) as f:
                detail = json.load(f)
        detail[str(rank)] = {
            "s_per_step": best,
            "optimizer": optimizer_name,
            "state_dtype": state_dtype or "float32",
            "lora_dtype": lora_dtype,
            "adapters_dtype": adapters_dtype,
            "trainable_gb": tree_size_bytes(trainable) / 1e9,
            "opt_state_gb": tree_size_bytes(opt_state) / 1e9,
        }
        with open(path, "w") as f:
            json.dump(detail, f, indent=1)
        log(f"[train] wrote {path}")
    return best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--layers", type=int, default=60)
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--state-dtype", default=None,
                    help="Adam moment storage dtype (e.g. bfloat16) — "
                         "halves optimizer-state HBM for large ranks")
    ap.add_argument("--lora-dtype", default="float32",
                    help="LoRA factor dtype (bfloat16 halves param+grad HBM)")
    ap.add_argument("--optimizer", default="adamw",
                    choices=("adamw", "adafactor"),
                    help="adafactor: factored second moment, ~zero state "
                         "HBM — the r=128 one-chip mode")
    ap.add_argument("--adapters-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="adapter (non-LoRA) master-weight dtype; bf16 "
                         "frees ~1 GB params+grads (one-chip r=128 "
                         "fallback; fp32 is the reference-fidelity mode)")
    args = ap.parse_args()
    run(args.rank, args.reps, args.layers, args.attn, args.state_dtype,
        args.lora_dtype, args.optimizer, args.adapters_dtype)
