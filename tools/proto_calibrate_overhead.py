"""Calibrate the fixed launch+fetch overhead of the chained harness on
the tunnelled runtime, by fitting wall(chain) = fixed + chain * per_step
across chain lengths for three program classes.

Motivation: tools/proto_ew_rate.py measured a trivial 8 MB elementwise
pass at "3.3 ms/step" with chain=8 — 26 ms of wall for ~0.2 ms of device
work — implying every small chained measurement in this repo carries a
~26 ms/chain_len additive bias.  The dit60 in-step numbers (one launch,
60 blocks, value fetch) are unaffected; standalone kernel numbers
(attention 14.2 ms etc.) may be substantially lower in truth.

Usage: python tools/proto_calibrate_overhead.py
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


def wall_per_chain(step_fn, init, chain, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, chain, lambda _, x: step_fn(x), x)

    def sync(x):
        leaf = x[0] if isinstance(x, tuple) else x
        return float(jnp.asarray(leaf).astype(jnp.float32).sum())

    x = run(init)
    sync(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x)
        sync(y)
        best = min(best, time.perf_counter() - t0)
        x = y
    return best


def fit(name, step_fn, init, chains=(2, 8, 32)):
    walls = [wall_per_chain(step_fn, init, c) for c in chains]
    # least-squares fit fixed + c * per_step
    a = np.vstack([np.ones(len(chains)), np.asarray(chains)]).T
    (fixed, per), *_ = np.linalg.lstsq(a, np.asarray(walls), rcond=None)
    detail = ", ".join(f"c={c}: {w*1e3:.1f}" for c, w in zip(chains, walls))
    log(f"{name:34s}: fixed={fixed*1e3:6.1f} ms  per_step={per*1e3:7.3f} ms"
        f"   [{detail}]")
    return fixed, per


def main():
    rng = np.random.default_rng(0)

    x8 = jnp.asarray(rng.normal(size=(4096, 1024)) * 0.1, jnp.bfloat16)
    fit("trivial ew 8MB", lambda x: x * jnp.bfloat16(0.999)
        + jnp.bfloat16(1e-4), x8)

    x311 = jnp.asarray(rng.normal(size=(16896, 9216)) * 0.1, jnp.bfloat16)
    fit("ew 311MB", lambda x: x * jnp.bfloat16(0.999)
        + jnp.bfloat16(1e-4), x311, chains=(2, 8, 16))

    # int8 dot at the fc1 shape
    xi = jnp.asarray(rng.integers(-100, 100, size=(16384, 3072)), jnp.int8)
    wi = jnp.asarray(rng.integers(-100, 100, size=(3072, 12288)), jnp.int8)

    def int8_step(c):
        x, w = c
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # fold the result back into an int8 x to keep the chain data-dep
        x2 = (x + (y[:, :3072] >> 24).astype(jnp.int8))
        return (x2, w)
    f_int8, p_int8 = fit("XLA int8 dot fc1 (M=16384)", int8_step, (xi, wi))
    flops = 2 * 16384 * 3072 * 12288
    log(f"  -> true int8 rate: {flops/p_int8/1e12:.0f} TOPS")

    # the shipped attention kernel at the DiT shape
    from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd
    b, n, s, d = 2, 24, 8448, 128
    q0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((b, s), bool)

    def attn_step(c):
        q, k = c
        o = flash_attention_bnsd(q, k, k, key_mask=mask,
                                 block_q=768, block_k=2816, clamp=False)
        return (o * jnp.bfloat16(0.999) + jnp.bfloat16(1e-4), k)
    f_at, p_at = fit("shipped flash attn (768,2816)", attn_step, (q0, q0),
                     chains=(2, 6, 16))
    log(f"  -> true attention: {p_at*1e3:.2f} ms "
        f"({4*b*n*s*s*d/p_at/1e12:.0f} TFLOPS)")


if __name__ == "__main__":
    main()
