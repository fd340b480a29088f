"""Component-level profile of the DiT block at the production workload.

Answers, on the real chip:
  1. where the per-block time goes (QKV GEMM, attention, MLP, to_out),
  2. host->device bandwidth (feasibility of per-block weight streaming),
  3. bf16 vs int8 GEMM rates at the workload shapes,
  4. HBM capacity probe.

Timing methodology: the tunnelled axon runtime dedups / reorders repeated
launches, so every measurement is a DATA-DEPENDENT CHAIN of N iterations
inside one jit call (each iteration consumes the previous output); the
wall time of the whole call divided by N is immune to runtime games.

Usage: python tools/profile_block.py [--quick] [--hbm-probe]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CHAIN = 8


def chain_time(step_fn, init, warmup=1, reps=3):
    """step_fn: x -> x (same pytree shape). Returns seconds per step."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, CHAIN, lambda _, x: step_fn(x), x)

    x = init
    for _ in range(warmup):
        x = run(x)
        jax.block_until_ready(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
        x = y
    return best


def gemm_chain(m, k, n, dtype, rng):
    """Chained y = (x @ w1) @ w2, w1:[k,n], w2:[n,k]; 2 GEMMs per step."""
    if dtype == jnp.int8:
        # int8 x int8 -> int32, requantize to int8 for the chain.
        w1 = jnp.asarray(rng.integers(-3, 4, (k, n)), jnp.int8)
        w2 = jnp.asarray(rng.integers(-3, 4, (n, k)), jnp.int8)
        x0 = jnp.asarray(rng.integers(-3, 4, (m, k)), jnp.int8)

        def step(x):
            y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = (y >> 8).astype(jnp.int8)
            z = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (z >> 8).astype(jnp.int8)
    else:
        w1 = jnp.asarray(rng.normal(size=(k, n)) * 0.02, dtype)
        w2 = jnp.asarray(rng.normal(size=(n, k)) * 0.02, dtype)
        x0 = jnp.asarray(rng.normal(size=(m, k)), dtype)

        def step(x):
            y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32).astype(dtype)
            return jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32).astype(dtype)

    s = chain_time(step, x0) / 2  # per GEMM
    return s, 2 * m * k * n / s / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--hbm-probe", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    if args.hbm_probe:
        # Bisect HBM capacity by allocating int8 buffers.
        alive = []
        gb = 0
        try:
            for _ in range(64):
                alive.append(jax.device_put(np.zeros((1, 1024, 1024, 1024), np.int8)))
                jax.block_until_ready(alive[-1])
                gb += 1
                log(f"allocated {gb} GB")
        except Exception as e:  # noqa: BLE001
            log(f"allocation failed at {gb + 1} GB: {type(e).__name__}")
        del alive
        return

    # ---- H2D bandwidth --------------------------------------------------
    host = np.ones((512, 1024, 1024), np.int8)  # 512 MB
    for _ in range(2):
        jax.block_until_ready(jax.device_put(host))
    t0 = time.perf_counter()
    x = jax.device_put(host)
    jax.block_until_ready(x)
    h2d = host.nbytes / (time.perf_counter() - t0) / 1e9
    del x, host
    log(f"H2D bandwidth: {h2d:.2f} GB/s")

    # ---- HBM bandwidth (chained elementwise) -----------------------------
    buf = jnp.ones((256, 1024, 1024), jnp.int8)  # 256 MB
    s = chain_time(lambda x: x + jnp.int8(1), buf)
    log(f"HBM elementwise bandwidth (r+w): {2 * buf.nbytes / s / 1e9:.0f} GB/s")
    del buf

    # ---- GEMMs at workload shapes ---------------------------------------
    shapes = [
        ("img_qkv  [16384,3072]x[3072,9216] ", 16384, 3072, 9216),
        ("to_out   [16384,3072]x[3072,3072] ", 16384, 3072, 3072),
        ("img_fc1  [16384,3072]x[3072,12288]", 16384, 3072, 12288),
    ]
    for name, m, k, n in shapes:
        s_bf, tf_bf = gemm_chain(m, k, n, jnp.bfloat16, rng)
        s_i8, tf_i8 = gemm_chain(m, k, n, jnp.int8, rng)
        log(f"{name}: bf16 {s_bf*1e3:7.2f} ms ({tf_bf:6.1f} TFLOPS) | "
            f"int8 {s_i8*1e3:7.2f} ms ({tf_i8:6.1f} TOPS)")

    # ---- Attention at workload shape ------------------------------------
    from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd
    from physicedit_tpu.ops.attention import sdpa_bnsd

    b, n_h, s_all, d = 2, 24, 8448, 128
    mask = jnp.ones((b, s_all), bool)
    att_flops = 4 * b * n_h * s_all * s_all * d
    q0 = jnp.asarray(rng.normal(size=(b, n_h, s_all, d)) * 0.1, jnp.bfloat16)

    combos = [(256, 512), (256, 1024), (512, 1024), (512, 2048), (1024, 1024)]
    if args.quick:
        combos = [(256, 1024), (512, 1024)]
    for bq, bk in combos:
        try:
            def step(x, bq=bq, bk=bk):
                o = flash_attention_bnsd(x, x, x, key_mask=mask,
                                         block_q=bq, block_k=bk)
                return o * 0.999  # keep magnitudes stable across the chain

            s = chain_time(step, q0)
            log(f"flash bq={bq:4d} bk={bk:4d}: {s*1e3:7.2f} ms "
                f"({att_flops/s/1e12:5.1f} TFLOPS)")
        except Exception as e:  # noqa: BLE001
            log(f"flash bq={bq} bk={bk}: FAILED {type(e).__name__}: {e}")
    try:
        s = chain_time(lambda x: sdpa_bnsd(x, x, x, key_mask=mask) * 0.999, q0)
        log(f"sdpa_xla            : {s*1e3:7.2f} ms ({att_flops/s/1e12:5.1f} TFLOPS)")
    except Exception as e:  # noqa: BLE001
        log(f"sdpa_xla FAILED: {e}")
    del q0

    # ---- Full block ------------------------------------------------------
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    cfg = jdit.DiTConfig(num_layers=1)
    params = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype),
        jax.eval_shape(lambda: jdit.init_dit_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)))
    grid = 64
    img_cos, img_sin, txt_cos, txt_sin = map(jnp.asarray, jrope.build_rope_tables(
        [(1, grid, grid), (1, grid, grid)], 256))
    blk = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])
    temb = jnp.zeros((b, 3072), jnp.bfloat16)
    joint_mask = jnp.ones((b, s_all), bool)

    for impl in ("pallas", "xla"):
        def step(carry, impl=impl):
            text, image = carry
            text, image = jdit.block_forward(
                blk, cfg, image, text, temb, img_cos, img_sin, txt_cos,
                txt_sin, joint_mask, attn_impl=impl)
            return (text * 0.999, image * 0.999)

        init = (jnp.asarray(rng.normal(size=(b, 256, 3072)) * 0.1, jnp.bfloat16),
                jnp.asarray(rng.normal(size=(b, 8192, 3072)) * 0.1, jnp.bfloat16))
        s = chain_time(step, init)
        log(f"full block ({impl:6s} attn): {s*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
