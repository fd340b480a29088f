"""Measure run_vision_batched at serving batches (392-sq conditioning
images, 784 patches each) vs the per-image tower.

Usage: python tools/proto_vision_batched.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    from bench import bench_vision  # reuse its param init? no - inline
    from physicedit_tpu.core.params import linear_init, random_tree_like
    from physicedit_tpu.models import qwen_vl_vision as m

    cfg = m.QWEN25_VL_VISION
    dtype = jnp.bfloat16

    def init():
        k = iter(jax.random.split(jax.random.PRNGKey(0), 8 * cfg.depth + 8))
        d, mdim = cfg.hidden_size, cfg.hidden_size * cfg.merge_unit

        def block():
            return {
                "norm1": {"scale": jnp.ones((d,), dtype)},
                "qkv": linear_init(next(k), d, 3 * d, dtype),
                "proj": linear_init(next(k), d, d, dtype),
                "norm2": {"scale": jnp.ones((d,), dtype)},
                "mlp": {
                    "gate": linear_init(next(k), d, cfg.intermediate_size, dtype),
                    "up": linear_init(next(k), d, cfg.intermediate_size, dtype),
                    "down": linear_init(next(k), cfg.intermediate_size, d, dtype),
                },
            }

        blocks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[block() for _ in range(cfg.depth)])
        return {
            "patch_embed": {"w": jax.random.normal(
                next(k), (3 * 2 * 14 * 14, d), dtype) * 0.02},
            "blocks": blocks,
            "merger": {
                "ln_q": {"scale": jnp.ones((d,), dtype)},
                "fc1": linear_init(next(k), mdim, mdim, dtype),
                "fc2": linear_init(next(k), mdim, cfg.out_hidden_size, dtype),
            },
        }

    params = random_tree_like(3, jax.eval_shape(init))
    in_dim = 3 * cfg.temporal_patch_size * cfg.patch_size ** 2
    rng = np.random.default_rng(0)
    grid_one = (1, 28, 28)

    for b in (1, 4, 8):
        base = jnp.asarray(rng.normal(size=(b, 784, in_dim)) * 0.1, dtype)
        fetch(base)

        def run(i):
            p = base * jnp.asarray(1.0 + 0.03 * i, dtype)
            t0 = time.perf_counter()
            if b == 1:
                fetch(m.run_vision(params, cfg, p[0], [grid_one]))
            else:
                fetch(m.run_vision_batched(params, cfg, p, grid_one))
            return time.perf_counter() - t0

        run(0)
        best = min(run(i) for i in (1, 2, 3))
        log(f"B={b}: {best*1e3:.1f} ms total, {best/b*1e3:.2f} ms/item")


if __name__ == "__main__":
    main()
