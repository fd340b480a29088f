"""Precompile the denoise program for a set of resolution buckets.

Production nicety for sweep serving: the PICA sweep runs at quantised
native resolutions (eval/sweep.py), so a handful of (height, width,
edit_hw, txt_len) buckets covers the dataset.  Warming them up front (with
the persistent compilation cache enabled) removes all compile stalls from
the sweep itself.

Usage:
  python tools/warm_cache.py --buckets 1024x1024 832x1216 1216x832 \
      --steps 40 --txt_len 512
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    import jax.numpy as jnp

    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.models import adapters as jad
    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.ops.attention import default_impl
    from physicedit_tpu.sampling import flow_match as fm
    from physicedit_tpu.sampling.denoise import denoise

    p = argparse.ArgumentParser()
    p.add_argument("--buckets", nargs="+", default=["1024x1024"])
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--txt_len", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=60)
    args = p.parse_args(argv)

    dtype = jnp.bfloat16
    cfg = jdit.DiTConfig(num_layers=args.num_layers)
    shapes = jax.eval_shape(
        lambda: jdit.init_dit_params(jax.random.PRNGKey(0), cfg, dtype))
    params = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    adapter = jax.tree_util.tree_map(
        lambda x: x.astype(dtype),
        jad.init_dual_adapter_params(jax.random.PRNGKey(1), 3584, 3584))
    t_min, t_max = fm.adapter_t_range()

    for bucket in args.buckets:
        h, w = (int(x) for x in bucket.split("x"))
        lat_h, lat_w = h // 8, w // 8
        grid = (lat_h // 2, lat_w // 2)
        sched = fm.qwen_inference_schedule(args.steps, h, w)
        ropes = list(map(jnp.asarray, jrope.build_rope_tables(
            [(1, *grid), (1, *grid)], args.txt_len)))
        latents = jnp.zeros((1, lat_h, lat_w, 16), dtype)
        extra = jnp.zeros((1, grid[0] * grid[1], 64), dtype)
        emb = jnp.zeros((2, args.txt_len, 3584), dtype)
        mask = jnp.ones((2, args.txt_len), bool)
        special = jnp.tile(jnp.arange(64)[None], (2, 1)).astype(jnp.int32)
        t0 = time.time()
        out = denoise(params, cfg, latents, extra, emb, mask, *ropes,
                      jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                      jnp.asarray(sched.timesteps), jnp.asarray(4.0),
                      latent_hw=(lat_h, lat_w), adapter_params=adapter,
                      special_idx=special, t_min=t_min, t_max=t_max,
                      attn_impl=default_impl())
        jax.block_until_ready(out)
        print(f"[warm] {bucket}: {time.time() - t0:.1f} s")


if __name__ == "__main__":
    main()
