"""Bisect the B=8 greedy-decode per-token cost into components.

Measured whole (bench.py): ~13.5 ms/token at B=8, S_max=2536, int8 KV
cache, W4 fused projections.  Analytic read floor: layer weights 3.26 GB
(W4) + lm_head 0.27 GB + int8 caches 0.58 GB ~= 4.1 GB -> ~5 ms at the
819 GB/s v5e HBM.  This tool times ablated decode loops to locate the
rest:

  full    — the real step (GEMVs + cache attention + logits + slab write)
  nologit — lm_head GEMV replaced by a sum over hidden (next token fixed)
  noattn  — cache attention replaced by a cheap mix of k_new (weights
            still read; cache reads and the einsum transposes gone)
  gemv    — noattn + nologit (pure weight-read chain)

Each variant scans NDEC tokens on-device with a data-dependent carry
(OPERATIONS.md pattern A) and fetches one scalar.
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physicedit_tpu.core.params import random_tree_like
from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
from physicedit_tpu.models import qwen_vl as m
from physicedit_tpu.models.qwen_vl import (_decode_layer_xs, _kv_quantize,
                                           embed_tokens, lm_logits, rms_norm)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = dataclasses.replace(m.QWEN25_VL_7B_TEXT, eos_token_id=-1)
DT = jnp.bfloat16
B, S, NDEC = 8, 1536, 32
S_MAX = S + 1000


def _cheap_attn_layer(p, cfg, x, cos, sin, bias_cache, kc, vc):
    """GEMVs intact, cache attention replaced by a trivial mix."""
    b = x.shape[0]
    h = rms_norm(x, p["ln1"]["scale"], cfg.eps)
    q, k, v = m._qkv_proj(p, cfg, h, b, 1)
    attn = (q * 0.01).reshape(b, 1, -1) \
        + jnp.repeat(k + v, cfg.num_heads // cfg.num_kv_heads, axis=2
                     ).reshape(b, 1, -1) * 0.01
    from physicedit_tpu.core.params import linear
    x = x + linear(p["o"], attn)
    x = x + m._mlp(p["mlp"], rms_norm(x, p["ln2"]["scale"], cfg.eps))
    return x, k, v


def make_step(params, caches, variant: str):
    k8, ks, v8, vs = caches

    def step(carry, _):
        tok, pos, rope_pos = carry
        x = embed_tokens(params, tok)[:, None, :]
        pids = jnp.broadcast_to(rope_pos[None, :, None], (3, B, 1))
        cos, sin = m.mrope_cos_sin(pids, cfg)
        k_pos = jnp.arange(S_MAX)[None, :]
        ok = k_pos < pos
        bias = jnp.where(ok, 0.0, -1e30)[:, None, None, :].astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (B, 1, 1, S_MAX))

        layer_fn = (_cheap_attn_layer if variant in ("noattn", "gemv")
                    else _decode_layer_xs)

        def layer_body(x, inp):
            lp, kc8, kcs, vc8, vcs = inp
            x, k_new, v_new = layer_fn(lp, cfg, x, cos, sin, bias,
                                       (kc8, kcs), (vc8, vcs))
            return x, (k_new, v_new)

        x, (k_stack, v_stack) = jax.lax.scan(
            layer_body, x, (params["layers"], k8, ks, v8, vs))
        hidden = rms_norm(x, params["norm"]["scale"], cfg.eps)
        if variant in ("nologit", "gemv"):
            nxt = (jnp.sum(hidden[:, -1], axis=-1) * 100).astype(jnp.int32) \
                % 1000
        else:
            nxt = jnp.argmax(lm_logits(params, hidden[:, -1]), axis=-1
                             ).astype(jnp.int32)
        return (nxt, pos + 1, rope_pos + 1), None

    return step


def run_variant(params, caches, first, variant):
    # params/caches ride as jit ARGUMENTS — closure capture would embed
    # 5+ GB as HLO constants and stall compilation
    @functools.partial(jax.jit, static_argnames=("variant",))
    def loop(params, caches, tok0, variant):
        step = make_step(params, caches, variant)
        carry, _ = jax.lax.scan(
            step, (tok0, jnp.int32(S), jnp.full((B,), S, jnp.int32)),
            None, length=NDEC)
        return carry[0]

    out = loop(params, caches, first, variant)
    _ = int(jnp.asarray(out).sum())
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        out = loop(params, caches, (first + i + 1) % 1000, variant)
        _ = int(jnp.asarray(out).sum())
        best = min(best, time.perf_counter() - t0)
    return best / NDEC


def main():
    shapes = jax.eval_shape(lambda: m.fuse_decode_projections(
        quantize_tree_int4(m.init_text_params(jax.random.PRNGKey(0), cfg, DT))))
    params = random_tree_like(2, shapes)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.1, DT)
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
    attn = jnp.ones((B, S), bool)
    logits, caches, _ = m.prefill(params, cfg, emb, pos, attn, S_MAX,
                                  kv_int8=True)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    log(f"B={B} S={S} S_max={S_MAX} NDEC={NDEC}")

    # Anchor: the REAL greedy_decode (adds the per-token kv-quantize +
    # cache slab writes the ablated loops omit).
    key_mask = jnp.concatenate(
        [attn, jnp.zeros((B, S_MAX - S), bool)], 1)

    @jax.jit
    def whole(params, caches, key_mask, tok0):
        toks, _ = m.greedy_decode(params, cfg, caches, tok0, S,
                                  jnp.full((B,), S, jnp.int32), NDEC,
                                  key_mask=key_mask)
        return toks

    _ = int(jnp.asarray(whole(params, caches, key_mask, first)).sum())
    res = {}
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        out = whole(params, caches, key_mask, (first + i + 1) % 1000)
        _ = int(jnp.asarray(out).sum())
        best = min(best, time.perf_counter() - t0)
    res["whole"] = best / NDEC
    log(f"{'whole':8s}: {res['whole']*1e3:7.2f} ms/token (real greedy_decode)")

    for variant in ("full", "nologit", "noattn", "gemv"):
        res[variant] = run_variant(params, caches, first, variant)
        log(f"{variant:8s}: {res[variant]*1e3:7.2f} ms/token")
    log(f"-> cache write+quant: {(res['whole'] - res['full'])*1e3:6.2f} ms")
    log(f"-> lm_head logits : {(res['full'] - res['nologit'])*1e3:6.2f} ms")
    log(f"-> cache attention: {(res['nologit'] - res['gemv'])*1e3:6.2f} ms "
        f"(noattn-gemv = logits again: "
        f"{(res['noattn'] - res['gemv'])*1e3:.2f})")
    log(f"-> GEMV chain     : {res['gemv']*1e3:6.2f} ms "
        f"(weight read floor ~4.0 ms)")


if __name__ == "__main__":
    main()
