"""Quantify the DiT block's non-GEMM non-attention glue at the production
workload (B=2, S_i=8448, S_t=256, d=3072, 24x128 heads).

The per-block budget says: 33.1 in-step = attention 14.2 + GEMM-roofline
~15.7 (XLA int8 dot rate 252 TF, tools/proto_int8_rate.py) + ~3.2 glue.
Suspects (all HBM passes over ~100-310 MB tensors):
  1. QKV heads-major transpose [B,S,3,N,D] -> [3,B,N,S,D]  (~310 MB r+w)
  2. q/k RMS-norm (4 tensors)
  3. q/k RoPE (4 tensors)
  4. txt/img concatenate (3 joint buffers)
  5. residual + gate (image/text streams, x2 per block)

This tool measures (a) the current XLA subgraph for each stage chained,
(b) the combined QKV-prep subgraph (2..4 fused by XLA or not), to decide
which Pallas fusions to build.

Usage: python tools/proto_block_glue.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from tools._bench import chain_time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.ops.norms import rms_norm
    from physicedit_tpu.ops.rope import apply_rope

    b, grid, s_t = 2, 64, 256
    s_i = 2 * grid * grid
    n, hd, d = 24, 128, 3072
    rng = np.random.default_rng(0)
    img_cos, img_sin, txt_cos, txt_sin = map(
        jnp.asarray, jrope.build_rope_tables([(1, grid, grid),
                                              (1, grid, grid)], s_t))
    gamma = jnp.ones((hd,), jnp.bfloat16)

    qkv_i = jnp.asarray(rng.normal(size=(b, s_i, 3 * d)) * 0.1, jnp.bfloat16)
    qkv_t = jnp.asarray(rng.normal(size=(b, s_t, 3 * d)) * 0.1, jnp.bfloat16)

    def prep(qkv_img, qkv_txt, *, do_norm=True, do_rope=True,
             do_concat=True):
        """The exact block subgraph from the QKV GEMM outputs to the
        attention kernel inputs (models/dit.py:219-241)."""
        ii = qkv_img.reshape(b, s_i, 3, n, hd).transpose(2, 0, 3, 1, 4)
        tt = qkv_txt.reshape(b, s_t, 3, n, hd).transpose(2, 0, 3, 1, 4)
        iq, ik, iv = ii[0], ii[1], ii[2]
        tq, tk, tv = tt[0], tt[1], tt[2]
        if do_norm:
            iq = rms_norm(iq, gamma, 1e-6)
            ik = rms_norm(ik, gamma, 1e-6)
            tq = rms_norm(tq, gamma, 1e-6)
            tk = rms_norm(tk, gamma, 1e-6)
        if do_rope:
            iq = apply_rope(iq, img_cos, img_sin)
            ik = apply_rope(ik, img_cos, img_sin)
            tq = apply_rope(tq, txt_cos, txt_sin)
            tk = apply_rope(tk, txt_cos, txt_sin)
        if do_concat:
            q = jnp.concatenate([tq, iq], axis=2)
            k = jnp.concatenate([tk, ik], axis=2)
            v = jnp.concatenate([tv, iv], axis=2)
            return q, k, v
        return iq, ik, iv

    def bench(name, **kw):
        def step(c):
            q, k, v = prep(c[0], c[1], **kw)
            # consume into small outputs so the prep work cannot be DCE'd;
            # sums are one cheap pass each
            sq = jnp.sum(q, axis=(2, 3)).astype(jnp.float32)
            sk = jnp.sum(k, axis=(2, 3)).astype(jnp.float32)
            sv = jnp.sum(v, axis=(2, 3)).astype(jnp.float32)
            salt = (sq + sk + sv).mean() * 1e-6
            return (c[0] * (jnp.bfloat16(0.999)
                            + salt.astype(jnp.bfloat16)), c[1])
        t = chain_time(step, (qkv_i, qkv_t), chain=6)
        log(f"{name:42s}: {t*1e3:6.2f} ms")
        return t

    t_full = bench("qkv prep (transpose+norm+rope+concat)")
    bench("qkv prep, no concat", do_concat=False)
    bench("qkv prep, no norm", do_norm=False)
    bench("qkv prep, no rope", do_rope=False)
    bench("qkv prep, transpose only", do_norm=False, do_rope=False,
          do_concat=False)

    # baseline pass cost: one elementwise r+w over the same bytes
    def ew_step(c):
        return (c[0] * jnp.bfloat16(0.999) + jnp.bfloat16(1e-4), c[1])
    t_ew = chain_time(ew_step, (qkv_i, qkv_t), chain=6)
    log(f"{'one elementwise pass over qkv bytes':42s}: {t_ew*1e3:6.2f} ms")

    # residual + gate: image = image + g * img_o  (x2 per block incl txt)
    img = jnp.asarray(rng.normal(size=(b, s_i, d)) * 0.1, jnp.bfloat16)
    img_o = jnp.asarray(rng.normal(size=(b, s_i, d)) * 0.1, jnp.bfloat16)
    g = jnp.full((b, d), 0.5, jnp.bfloat16)

    def res_step(c):
        x, y = c
        x = x + g[:, None, :] * y
        return (x * jnp.bfloat16(0.999), y)
    t_res = chain_time(res_step, (img, img_o), chain=6)
    log(f"{'residual+gate over [2,8448,3072]':42s}: {t_res*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
