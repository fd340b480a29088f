"""Launch-calibrated GEMM rates at the DiT block shapes: bf16, int8, and
the shipped W4A8 path — with ALL output elements consumed (the earlier
probe let XLA narrow the dot to the sliced columns, reporting impossible
rates; tools/proto_calibrate_overhead.py).

Method: chain lengths (2, 8, 24) inside one jit; least-squares fit
wall = fixed + chain * per_step removes the ~26 ms launch+fetch overhead
of the tunnelled runtime.  The chain consumes every output column by a
4-way column-fold added into the carried operand.

Usage: python tools/proto_gemm_rate2.py
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


def wall(run, init, reps=3):
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


def fit(name, step_fn, init, flops, chains=(2, 8, 24)):
    walls = []
    for c in chains:
        @jax.jit
        def run(x, c=c):
            return jax.lax.fori_loop(0, c, lambda _, x: step_fn(x), x)
        walls.append(wall(run, init))
    a = np.vstack([np.ones(len(chains)), np.asarray(chains)]).T
    (fixed, per), *_ = np.linalg.lstsq(a, np.asarray(walls), rcond=None)
    detail = ", ".join(f"c={c}: {w*1e3:.1f}" for c, w in zip(chains, walls))
    log(f"{name:44s}: {per*1e3:7.3f} ms = {flops/per/1e12:5.0f} TF/TOPS "
        f"(fixed {fixed*1e3:.0f})   [{detail}]")
    return per


def fold_cols(y, out_cols, dtype):
    """Consume ALL columns of y into an [M, out_cols] tensor (4-way add)."""
    m, n = y.shape
    k = n // out_cols
    return jnp.sum(y.reshape(m, k, out_cols), axis=1).astype(dtype)


def main():
    rng = np.random.default_rng(0)
    m, kk, nn = 17408, 3072, 12288        # fc1 at the CFG denoise workload
    flops = 2 * m * kk * nn

    # ---- bf16 dot --------------------------------------------------------
    xb = jnp.asarray(rng.normal(size=(m, kk)) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(kk, nn)) * 0.1, jnp.bfloat16)

    def bf16_step(c):
        x, w = c
        y = x @ w
        return (x + fold_cols(y, kk, jnp.bfloat16) * jnp.bfloat16(1e-3), w)
    fit("bf16 dot fc1 [17408,3072]x[3072,12288]", bf16_step, (xb, wb), flops)

    # ---- int8 dot, i32 accum ---------------------------------------------
    xi = jnp.asarray(rng.integers(-100, 100, size=(m, kk)), jnp.int8)
    wi = jnp.asarray(rng.integers(-100, 100, size=(kk, nn)), jnp.int8)

    def int8_step(c):
        x, w = c
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return ((x + fold_cols(y >> 18, kk, jnp.int8)).astype(jnp.int8), w)
    fit("int8 dot (i32 acc), same shape", int8_step, (xi, wi), flops)

    # ---- int8 dot, bf16 output (scale epilogue shape) ----------------------
    def int8_scaled_step(c):
        x, w = c
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yb = y.astype(jnp.bfloat16) * jnp.bfloat16(1e-4)
        return ((x + fold_cols(yb, kk, jnp.int8)).astype(jnp.int8), w)
    fit("int8 dot + bf16 scale epilogue", int8_scaled_step, (xi, wi), flops)

    # ---- the shipped W4A8 linear (both impls) -----------------------------
    from physicedit_tpu.kernels import quant_matmul as qm

    wq = {"w4": jnp.asarray(rng.integers(-128, 127, size=(kk // 2, nn)),
                            jnp.int8),
          "w_scale": jnp.asarray(rng.normal(size=(nn,)) * 0.01, jnp.float32)}
    xa = jnp.asarray(rng.normal(size=(m, kk)) * 0.1, jnp.bfloat16)

    for impl in ("xla", "pallas"):
        qm.set_w4a8_impl(impl)

        def w4_step(c, wq=wq):
            x, _ = c
            y = qm.w4a8_linear(wq, x)
            return (x + fold_cols(y, kk, jnp.bfloat16) * jnp.bfloat16(1e-3),
                    c[1])
        fit(f"shipped w4a8_linear impl={impl}", w4_step, (xa, xa), flops)
    qm.set_w4a8_impl("pallas")

    # ---- unpack-only cost: int4 -> int8 materialize ------------------------
    def unpack_step(c):
        x, w4 = c
        lo = (w4 << 4).astype(jnp.int8) >> 4
        hi = w4.astype(jnp.int8) >> 4
        w8 = jnp.stack([lo, hi], 1).reshape(kk, nn)
        salt = fold_cols(w8, kk, jnp.int8)[: x.shape[0] % kk + 1, :1]
        return (x + salt[0, 0], w4)
    fit("int4->int8 unpack of fc1 weights (not GEMM flops)", unpack_step,
        (xi, wq["w4"]), flops)


if __name__ == "__main__":
    main()
