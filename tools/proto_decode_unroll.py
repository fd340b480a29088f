"""Hypothesis test: the decode GEMV chain's 6.8 ms/token excess over the
weight-read floor is the scan-xs slice materialisation.

`greedy_decode` scans the 28 layers with the stacked W4 weights as scan
xs; each iteration's sliced layer tree (~116 MB) must MATERIALISE before
the Pallas GEMV kernels can read it (Pallas operands are whole buffers —
the slice cannot fuse), costing an extra write+read of the full 3.26 GB
per token (~8 ms at v5e HBM).

Variant here: the layer loop is a Python loop over 28 per-layer trees
passed as separate jit arguments — no slicing, Pallas reads each layer's
buffer in place.  Token loop stays a lax.scan.

Usage: python tools/proto_decode_unroll.py
"""

import dataclasses
import functools
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

from physicedit_tpu.core.params import random_tree_like
from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
from physicedit_tpu.models import qwen_vl as m
from physicedit_tpu.models.qwen_vl import (_decode_layer_xs, embed_tokens,
                                           lm_logits, rms_norm)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = dataclasses.replace(m.QWEN25_VL_7B_TEXT, eos_token_id=-1)
DT = jnp.bfloat16
B, S, NDEC = 8, 1536, 32
S_MAX = S + 1000
L = cfg.num_layers


@functools.partial(jax.jit, static_argnames=())
def decode_unrolled(layers, top, caches, tok0):
    """layers: tuple of L per-layer trees; caches: (k8, ks, v8, vs) each
    [L, B, S_max, ...] (indexed statically).  Token loop = lax.scan;
    layer loop = Python (unrolled into the jaxpr)."""
    k8, ks, v8, vs = caches

    def step(carry, _):
        tok, pos, rope_pos = carry
        x = embed_tokens(top, tok)[:, None, :]
        pids = jnp.broadcast_to(rope_pos[None, :, None], (3, B, 1))
        cos, sin = m.mrope_cos_sin(pids, cfg)
        k_pos = jnp.arange(S_MAX)[None, :]
        ok = k_pos < pos
        bias = jnp.where(ok, 0.0, -1e30)[:, None, None, :].astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (B, 1, 1, S_MAX))

        kns, vns = [], []
        for i in range(L):
            x, k_new, v_new = _decode_layer_xs(
                layers[i], cfg, x, cos, sin, bias,
                (k8[i], ks[i]), (v8[i], vs[i]))
            kns.append(k_new)
            vns.append(v_new)
        hidden = rms_norm(x, top["norm"]["scale"], cfg.eps)
        nxt = jnp.argmax(lm_logits(top, hidden[:, -1]), axis=-1
                         ).astype(jnp.int32)
        # note: cache writes omitted (the bisect puts write+quant at
        # 0.06 ms/token) — this isolates the GEMV+attention chain
        del kns, vns
        return (nxt, pos + 1, rope_pos + 1), None

    carry, _ = jax.lax.scan(
        step, (tok0, jnp.int32(S), jnp.full((B,), S, jnp.int32)),
        None, length=NDEC)
    return carry[0]


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
    log(f"B={B} S={S} S_max={S_MAX} NDEC={NDEC} layers={L}")

    # split the stacked layer tree into per-layer trees (host-side, once)
    layers = tuple(
        jax.tree_util.tree_map(lambda a, i=i: a[i], params["layers"])
        for i in range(L))
    top = {k: v for k, v in params.items() if k != "layers"}

    t0 = time.perf_counter()
    out = decode_unrolled(layers, top, caches, first)
    _ = int(jnp.asarray(out).sum())
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        out = decode_unrolled(layers, top, caches, (first + i + 1) % 1000)
        _ = int(jnp.asarray(out).sum())
        best = min(best, time.perf_counter() - t0)
    log(f"unrolled decode: {best/NDEC*1e3:7.2f} ms/token "
        f"(scan-xs 'full' measured 12.83; weight floor ~4.5)")


if __name__ == "__main__":
    main()
