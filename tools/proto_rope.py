"""RoPE application variants at the DiT q/k shape [2, 24, 8448, 128].

The shipped apply_rope costs ~2.5 ms/block in-context (4x its ~0.6 ms
roofline, tools/proto_block_glue.py + launch calibration): fp32 convert +
stride-2 even/odd slices + stack/reshape re-interleave are three extra
passes/shuffles.

Variants (all mathematically identical up to float association):
  r0  shipped apply_rope (even/odd slices + stack)
  r1  interleaved tables [S, D] with sign folded + adjacent-pair swap via
      reshape(..., 64, 2)[..., ::-1]
  r2  half-layout rope (x[..., :64] / x[..., 64:]) — requires the head
      dim to be PERMUTED even-first at weight-load time (q.k dot is
      permutation-invariant when q and k share the permutation)
  r3  r2 in bf16 multiply (tables bf16; out = x*c + rot(x)*s)
Each is measured with the launch-overhead fit, and r1/r2 checked for
exact-match vs r0 (after the corresponding input permutation for r2).

Usage: python tools/proto_rope.py
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


def wall_fit(step_fn, init, chains=(2, 8, 24), reps=3):
    def sync(x):
        leaf = x[0] if isinstance(x, tuple) else x
        return float(jnp.asarray(leaf).astype(jnp.float32).sum())

    walls = []
    for c in chains:
        @jax.jit
        def run(x, c=c):
            return jax.lax.fori_loop(0, c, lambda _, x: step_fn(x), x)
        x = run(init)
        sync(x)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = run(x)
            sync(y)
            best = min(best, time.perf_counter() - t0)
            x = y
        walls.append(best)
    a = np.vstack([np.ones(len(chains)), np.asarray(chains)]).T
    (fixed, per), *_ = np.linalg.lstsq(a, np.asarray(walls), rcond=None)
    return per, fixed


def main():
    from physicedit_tpu.ops.rope import apply_rope

    rng = np.random.default_rng(0)
    b, n, s, d = 2, 24, 8448, 128
    x0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.5, jnp.bfloat16)
    cos = jnp.asarray(rng.normal(size=(s, d // 2)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(s, d // 2)), jnp.float32)
    cos = jnp.cos(cos)
    sin = jnp.sin(sin)

    # interleaved tables (r1): ci[2i]=ci[2i+1]=cos[i]; si[2i]=-sin[i],
    # si[2i+1]=sin[i]
    ci = jnp.repeat(cos, 2, axis=-1)
    si = jnp.stack([-sin, sin], axis=-1).reshape(s, d)

    # half-layout tables (r2/r3): ch = [cos | cos], sh = [-sin | sin]
    ch = jnp.concatenate([cos, cos], -1)
    sh = jnp.concatenate([-sin, sin], -1)
    ch_b, sh_b = ch.astype(jnp.bfloat16), sh.astype(jnp.bfloat16)

    def r0(x):
        return apply_rope(x, cos, sin)

    def r1(x):
        xs = x.reshape(b, n, s, d // 2, 2)[..., ::-1].reshape(b, n, s, d)
        return (x.astype(jnp.float32) * ci
                + xs.astype(jnp.float32) * si).astype(x.dtype)

    def rot_half(x):
        return jnp.concatenate([x[..., d // 2:], x[..., : d // 2]], -1)

    def r2(x):
        return (x.astype(jnp.float32) * ch
                + rot_half(x).astype(jnp.float32) * sh).astype(x.dtype)

    def r3(x):
        return x * ch_b + rot_half(x) * sh_b

    # correctness: r1 == r0 exactly; r2(perm(x)) == perm(r0(x))
    y0 = r0(x0)
    y1 = r1(x0)
    log("r1 vs r0 max abs:", float(jnp.max(jnp.abs(
        y1.astype(jnp.float32) - y0.astype(jnp.float32)))))
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    xp = x0[..., perm]
    y2 = r2(xp)
    log("r2(perm) vs perm(r0) max abs:", float(jnp.max(jnp.abs(
        y2.astype(jnp.float32) - y0[..., perm].astype(jnp.float32)))))
    y3 = r3(xp)
    log("r3(perm) vs perm(r0) max abs (bf16 tables):", float(jnp.max(jnp.abs(
        y3.astype(jnp.float32) - y0[..., perm].astype(jnp.float32)))))

    for name, f in (("r0 shipped", r0), ("r1 interleaved+swap", r1),
                    ("r2 half fp32", r2), ("r3 half bf16", r3)):
        per, fixed = wall_fit(
            lambda x, f=f: f(x) * jnp.bfloat16(0.999) + jnp.bfloat16(1e-3),
            x0)
        log(f"{name:22s}: {per*1e3:6.3f} ms/apply (fixed {fixed*1e3:.0f})")


if __name__ == "__main__":
    main()
