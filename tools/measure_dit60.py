"""MEASURED (not extrapolated) full 60-block DiT denoise step on one chip.

The 20B bf16 model (40.7 GB) cannot fit one 16 GB v5e, and the tunnelled
host link (~1.4 GB/s) rules out per-block weight streaming — so the
single-chip configuration is W4A8 (packed int4 weights, 10.25 GB
HBM-resident), the TPU answer to the reference's CPU-offload VRAM manager
(diffsynth/vram_management/layers.py:95-171).

Weights are created directly in the quantized layout (eval_shape the
init+quantize composition, then fill with on-device random bytes) — bf16
is never materialised.  MXU/VPU timing is value-independent, so random
weights give the true production step latency.

Timing methodology: K sequential calls whose image-token input depends on
the previous output (euler-like), nan_to_num'd and perturbed by a
per-call scalar so inputs stay finite and distinct — the tunnelled
runtime memoizes repeated launches whose arguments are bit-identical.

Usage: python tools/measure_dit60.py [--layers 60] [--reps 6]
"""

import argparse
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


def measure_dit60(num_layers: int = 60, reps: int = 6,
                  attn_impl: str = "pallas", slim: bool = True,
                  batch: int = 2, params=None, grid=(64, 64),
                  edit_grid=None):
    """batch=2 is the CFG step (the reference workload); batch=1 is the
    positive-only step of the opt-in --cfg_truncate_step serving mode.
    Pass ``params`` to reuse an already-materialised quantized tree
    (avoids a second 10.25 GB fill when measuring both batches).

    ``grid``: output-latent patch grid (gh, gw) = (H/16, W/16) — (64, 64)
    is the 1024-sq default; other values measure the native-resolution
    serving shapes (tools/mixed_res_serving.py).  ``edit_grid`` defaults
    to ``grid`` (the PICA convention: edit image at the output size)."""
    from physicedit_tpu.core.params import random_tree_like, tree_size_bytes
    from physicedit_tpu.kernels.quant_matmul import (DIT_OUTER_KEYS,
                                                     quantize_tree_int4)
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    cfg = jdit.DiTConfig(num_layers=num_layers)
    dtype = jnp.bfloat16
    if params is None:
        # production mixed-precision spec: blocks int4, embed/head bf16
        # (quant_divergence lane — 5x lower cumulative latent drift)
        shapes = jax.eval_shape(lambda: quantize_tree_int4(
            jdit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype),
            skip_top=DIT_OUTER_KEYS))
        t0 = time.perf_counter()
        params = random_tree_like(1, shapes)
        log(f"quantized params materialised: "
            f"{tree_size_bytes(params)/1e9:.2f} GB "
            f"in {time.perf_counter()-t0:.0f}s")

    b, s_t = batch, 256
    gh, gw = grid
    eh, ew = grid if edit_grid is None else edit_grid
    tables = tuple(map(jnp.asarray, jrope.build_rope_tables(
        [(1, gh, gw), (1, eh, ew)], s_t)))
    mask = jnp.ones((b, s_t), bool)

    s_base = gh * gw
    s_edit = eh * ew
    slim_n = s_base if slim else 0

    # load-time clamp decision, exactly like the pipeline: unit gammas
    # bound the fixed-max logits far below CLAMP -> the min() is inert
    clamp = jdit.attn_clamp_needed(params)
    log(f"attn clamp needed: {clamp}")

    @jax.jit
    def fwd(params, img_tokens, txt_tokens, tables, mask, salt):
        # slim_last: the production denoise config (sampling/denoise.py) —
        # the last block computes only the base rows the Euler step keeps
        out = jdit.dit_forward(params, cfg, img_tokens, txt_tokens,
                               jnp.full((b,), 0.5, dtype), *tables,
                               txt_key_mask=mask, attn_impl=attn_impl,
                               slim_last=slim_n, attn_clamp=clamp)
        nxt_base = jnp.nan_to_num(
            img_tokens[:, :s_base] + 0.01 * out[:, :s_base],
            nan=0.1, posinf=1.0, neginf=-1.0)
        nxt = jnp.concatenate([nxt_base, img_tokens[:, s_base:]], axis=1)
        return (nxt * (1.0 + salt)).astype(dtype)  # finite, distinct per call

    rng = np.random.default_rng(0)
    it = jnp.asarray(rng.normal(size=(b, s_base + s_edit, cfg.patch_dim)) * 0.1,
                     dtype)
    tt = jnp.asarray(rng.normal(size=(b, s_t, cfg.txt_in_dim)) * 0.1, dtype)

    t0 = time.perf_counter()
    it = fwd(params, it, tt, tables, mask, jnp.float32(0.15))
    float(it.sum())  # value fetch: block_until_ready returns early on the
    # tunnelled runtime for queued dispatch chains; only a fetch is honest
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s")

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        it = fwd(params, it, tt, tables, mask, jnp.float32(0.1 * ((i % 5) + 1)))
        float(it.sum())
        best = min(best, time.perf_counter() - t0)
    return best, params


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=60)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--attn", default="pallas")
    args = ap.parse_args()
    s, _ = measure_dit60(args.layers, args.reps, attn_impl=args.attn)
    log(f"MEASURED {args.layers}-block CFG denoise step (W4A8): {s:.3f} s "
        f"({s/args.layers*1e3:.2f} ms/block)")
