"""Prototype: W4 weights unpacked by XLA elementwise ops + XLA int8 dot,
vs the fused Pallas W4A8 kernel.

XLA's int8 matmul reaches 235-255 TOPS at DiT shapes where the Pallas
kernel plateaus ~140-170.  Unpacking [K/2, N] packed nibbles to an int8
[K, N] scratch is one extra HBM round-trip (~2.5 bytes/weight), ~0.9 ms
per DiT block — worth it if the dot really runs at XLA rates.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tools._bench import chain_time  # noqa: E402


def unpack_w4(packed):
    """[K/2, N] int8 packed -> [K, N] int8 (offset-encoded low nibble,
    kernels/quant_matmul.py docstring)."""
    lo = ((packed & jnp.int8(15)) - jnp.int8(8)).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


@jax.jit
def w4_xla_matmul(x_q, packed, x_scale, w_scale):
    w8 = unpack_w4(packed)
    acc = jax.lax.dot_general(x_q, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale[None, :]
            ).astype(jnp.bfloat16)


def main():
    from physicedit_tpu.kernels.quant_matmul import (_w4a8_matmul,
                                                     quantize_weight_int4)

    rng = np.random.default_rng(0)
    # correctness
    k, n, m = 512, 512, 256
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    p = quantize_weight_int4(jnp.asarray(w))
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    xs = jnp.ones((m, 1), jnp.float32)
    got = w4_xla_matmul(xq, p["w4"], xs, p["w_scale"])
    wq = np.clip(np.round(w / np.maximum(np.abs(w).max(0, keepdims=True) / 7, 1e-8)),
                 -7, 7)
    want = (np.asarray(xq, np.float32) @ (wq * np.asarray(p["w_scale"])[None, :]))
    err = np.abs(np.asarray(got, np.float32) - want).max() / np.abs(want).max()
    log(f"correctness rel err: {err:.2e}")

    shapes = [
        ("qkv    m16384 k3072 n9216 ", 16384, 3072, 9216),
        ("to_out m16384 k3072 n3072 ", 16384, 3072, 3072),
        ("fc1    m16384 k3072 n12288", 16384, 3072, 12288),
        ("fc2    m16384 k12288 n3072", 16384, 12288, 3072),
    ]
    for name, m, k, n in shapes:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        p = quantize_weight_int4(jnp.asarray(w))
        xs0 = jnp.ones((m, 1), jnp.float32)
        wsb = jnp.stack([p["w_scale"], jnp.zeros((n,), jnp.float32)])
        x0 = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        flops = 2 * m * k * n

        def step_xla(x):
            y = w4_xla_matmul(x, p["w4"], xs0, p["w_scale"])
            y8 = jnp.clip(y * 8.0, -127, 127).astype(jnp.int8)
            return jnp.roll(y8[:, :k] if n >= k else
                            jnp.pad(y8, ((0, 0), (0, k - n))), 1, 0)

        s = chain_time(step_xla, x0)
        log(f"{name} XLA-unpack: {s*1e3:6.2f} ms ({flops/s/1e12:6.1f} TOPS)")

        def step_pal(x):
            y = _w4a8_matmul(x, p["w4"], xs0, wsb, jnp.int8,
                             block_m=512, block_n=min(n, 1024), block_k2=512)
            return jnp.roll(y[:, :k] if n >= k else
                            jnp.pad(y, ((0, 0), (0, k - n))), 1, 0)

        s = chain_time(step_pal, x0)
        log(f"{name} Pallas     : {s*1e3:6.2f} ms ({flops/s/1e12:6.1f} TOPS)")


if __name__ == "__main__":
    main()
