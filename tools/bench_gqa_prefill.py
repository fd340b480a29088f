"""Measure the GQA causal flash prefill attention vs the dense XLA path.

Chains many attention calls inside ONE jitted scan (the per-invocation
tunnel dispatch floor is ~25-30 ms, so single-call timing is meaningless);
the chain is data-dependent (output feeds the next call's q) so the
runtime cannot elide any iteration.  Value-fetch sync per timed call.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp

from physicedit_tpu.kernels.flash_attention import gqa_causal_flash
from physicedit_tpu.models.qwen_vl import _gqa_attention

CHAIN = 28  # = one full VL model's worth of attention layers


def chain_fn(attn_call, b, s, n, kv, d):
    def f(q, k, v):
        def body(q, _):
            out = attn_call(q, k, v)              # [B, S, N*D]
            q2 = out.reshape(b, s, n, d) * 1e-3 + q * 0.999
            return q2.astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return q
    return jax.jit(f)


def timeit(f, q, k, v, tag, reps=6):
    out = f(q, k, v)
    _ = np.asarray(out[0, :1, :1, :8], np.float32)
    ts = []
    for i in range(reps):
        qq = q + jnp.bfloat16(0.01 * (i + 1))
        t0 = time.perf_counter()
        out = f(qq, k, v)
        _ = np.asarray(out[0, :1, :1, :8], np.float32)
        ts.append(time.perf_counter() - t0)
    per_call = min(ts) / CHAIN
    print(f"{tag}: {per_call*1e3:.2f} ms/call ({CHAIN}-chain min "
          f"{min(ts)*1e3:.0f} ms)", flush=True)
    return per_call


def main():
    s, n, kv, d = 1536, 28, 4, 128
    rng = np.random.default_rng(0)
    for b in (1, 8):
        q = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32),
                        jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32),
                        jnp.bfloat16)
        mask = jnp.ones((b, s), bool)
        q_pos = jnp.arange(s)[:, None]
        k_pos = jnp.arange(s)[None, :]
        ok = (k_pos <= q_pos)[None] & mask[:, None, :]
        bias = jnp.where(ok, 0.0, -1e30)[:, None].astype(jnp.float32)

        f_flash = chain_fn(lambda q_, k_, v_: gqa_causal_flash(q_, k_, v_, mask),
                           b, s, n, kv, d)
        f_dense = chain_fn(lambda q_, k_, v_: _gqa_attention(q_, k_, v_, bias),
                           b, s, n, kv, d)
        tf = timeit(f_flash, q, k, v, f"gqa flash B={b} S={s}")
        td = timeit(f_dense, q, k, v, f"dense XLA B={b} S={s}")
        print(f"  -> speedup {td/tf:.2f}x; per-28-layer-model: "
              f"flash {tf*28*1e3:.0f} ms vs dense {td*28*1e3:.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
