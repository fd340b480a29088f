"""Benchmark: edits/min/chip for the PhysicEdit-TPU pipeline.

Runs on whatever accelerator is available (the driver runs it on one real
TPU chip).  Measures:
  1. per-DiT-block latency on the production workload (CFG-batched B=2,
     joint sequence = 4096 base + 4096 edit + 256 text tokens at 1024 sq,
     bf16) by differencing two layer counts (isolates fixed overhead),
  2. VAE decode at 1024 sq,
and extrapolates one full edit: 40 steps x (60 blocks + fixed) + VAE decode.

vs_baseline compares against an analytic A100 estimate for the reference
pipeline (BASELINE.md: no published numbers exist, so the baseline is
80 DiT forwards of 397 TFLOP at 45% MFU on 312 TFLOPS peak -> ~0.26
edits/min; see the constant below).

The 60-block extrapolation is validated: a real 12-layer denoise scan
(CFG + per-step special-token rewrite) measures within 0.5% of the
per-block prediction (PARITY.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compile cache: first-compile on this host is expensive (single
# CPU core drives XLA); subsequent bench runs reuse compiled programs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, make_args, warmup=2, iters=5):
    """fn(*make_args(i)) with FRESH inputs per call: the axon TPU runtime
    dedups repeated launches with identical argument buffers, which would
    make same-args timing loops read near-zero."""
    for i in range(warmup):
        jax.block_until_ready(fn(*make_args(i)))
    times = []
    for i in range(iters):
        args = make_args(warmup + i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def zeros_like_shapes(shape_tree):
    return jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shape_tree)


# Analytic A100 reference (see module docstring / BASELINE.md).
A100_EDITS_PER_MIN = 0.26

NUM_STEPS = 40
NUM_BLOCKS = 60


def main():
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.models import vae as jvae
    from physicedit_tpu.models.vae_init import init_vae_params
    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.ops.attention import default_impl

    platform = jax.devices()[0].platform
    attn_impl = default_impl()
    log(f"platform={platform} attn_impl={attn_impl}")
    dtype = jnp.bfloat16

    # ---- DiT block latency at the 1024 sq workload --------------------
    lat = 128
    grid = lat // 2
    s_img, s_t = grid * grid, 256
    b = 2
    img_cos, img_sin, txt_cos, txt_sin = map(jnp.asarray, jrope.build_rope_tables(
        [(1, grid, grid), (1, grid, grid)], s_t))
    img_tokens = jnp.zeros((b, 2 * s_img, 64), dtype)
    txt_tokens = jnp.zeros((b, s_t, 3584), dtype)
    mask = jnp.ones((b, s_t), bool)

    times = {}
    layer_counts = (1, 3) if platform != "cpu" else (1, 2)
    for n_layers in layer_counts:
        cfg = jdit.DiTConfig(num_layers=n_layers)
        params = zeros_like_shapes(jax.eval_shape(
            lambda c=cfg: jdit.init_dit_params(jax.random.PRNGKey(0), c, dtype)))

        def fwd(p, it, tt, ts):
            return jdit.dit_forward(p, cfg, it, tt, ts, img_cos, img_sin,
                                    txt_cos, txt_sin, txt_key_mask=mask,
                                    attn_impl=attn_impl)

        def make_args(i, params=params):
            return (params, img_tokens, txt_tokens,
                    jnp.full((b,), 0.5 + 0.001 * i, dtype))

        times[n_layers] = timeit(jax.jit(fwd), make_args,
                                 iters=3 if platform == "cpu" else 5)
        log(f"dit fwd {n_layers} layers: {times[n_layers]*1e3:.1f} ms")
        del params

    l1, l2 = layer_counts
    block_s = (times[l2] - times[l1]) / (l2 - l1)
    fixed_s = max(times[l1] - l1 * block_s, 0.0)
    step_s = NUM_BLOCKS * block_s + fixed_s
    log(f"per-block {block_s*1e3:.2f} ms, fixed {fixed_s*1e3:.2f} ms, "
        f"per-step (60 blocks, CFG batched) {step_s:.3f} s")

    # ---- VAE decode at 1024 sq ----------------------------------------
    vae_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_vae_params())
    vae_s = timeit(jax.jit(lambda p, z: jvae.decode(p, z)),
                   lambda i: (vae_params,
                              jnp.full((1, lat, lat, 16), 0.01 * i, dtype)),
                   iters=3)
    log(f"vae decode 1024^2: {vae_s*1e3:.1f} ms")

    # ---- Edit throughput ----------------------------------------------
    edit_s = NUM_STEPS * step_s + vae_s
    edits_per_min = 60.0 / edit_s
    log(f"estimated edit latency {edit_s:.1f} s -> {edits_per_min:.3f} edits/min/chip")

    print(json.dumps({
        "metric": "edits_per_min_per_chip_1024px_40steps",
        "value": round(edits_per_min, 4),
        "unit": "edits/min/chip",
        "vs_baseline": round(edits_per_min / A100_EDITS_PER_MIN, 3),
    }))


if __name__ == "__main__":
    main()
