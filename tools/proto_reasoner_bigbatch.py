"""Measure the reasoner decode at LARGE batch (the conditioning-offload
serving mode): per-token cost at B in {8, 32, 64, 128}, int8 KV caches,
split-layer W4 params (unrolled loop, new GEMV tiles).

The decode has a per-token cost that is nearly independent of B below the
cache-read-bound regime (weights 4 GB + ~6 ms of launch overhead are
shared); per-ITEM cost scales ~1/B.  With the DiT evicted to host during
the conditioning phase (h2d ~1 GB/s measured, tools/measure_transfer.py),
caches for 128 items (9.4 GB int8) fit next to the VL weights.

Standalone HBM check: VL W4 4.6 GB + caches <= 9.45 GB fits the 15.75 GB
chip without the DiT resident.

Usage: python tools/proto_reasoner_bigbatch.py [--batches 8,32,64,128]
"""

import argparse
import dataclasses
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = dataclasses.replace(m.QWEN25_VL_7B_TEXT, eos_token_id=-1)
DT = jnp.bfloat16
S, NDEC = 1536, 32
S_MAX = S + 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,64,128")
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]

    shapes = jax.eval_shape(lambda: m.split_layers(m.fuse_decode_projections(
        quantize_tree_int4(m.init_text_params(jax.random.PRNGKey(0), cfg,
                                              DT)))))
    params = random_tree_like(2, shapes)
    rng = np.random.default_rng(0)

    for b in batches:
        # prefill in chunks of 1 (the serving layout), caches concat
        emb1 = jnp.asarray(rng.normal(size=(1, S, cfg.hidden_size)) * 0.1, DT)
        pos1 = jnp.broadcast_to(jnp.arange(S)[None, None], (3, 1, S))
        attn1 = jnp.ones((1, S), bool)
        t0 = time.perf_counter()
        lg, c1, _ = m.prefill(params, cfg, emb1, pos1, attn1, S_MAX,
                              kv_int8=True)
        _ = float(jnp.asarray(lg).astype(jnp.float32).sum())
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        lg, c1, _ = m.prefill(params, cfg, emb1 * 1.001, pos1, attn1, S_MAX,
                              kv_int8=True)
        _ = float(jnp.asarray(lg).astype(jnp.float32).sum())
        t_pre = time.perf_counter() - t0
        log(f"B={b}: prefill chunk-1 {t_pre*1e3:.1f} ms "
            f"(compile+first {t_compile:.1f}s)")

        caches = tuple(jnp.concatenate([ci] * b, axis=1) for ci in c1)
        first = jnp.broadcast_to(jnp.argmax(lg, -1).astype(jnp.int32),
                                 (b,))
        key_mask = jnp.ones((b, S_MAX), bool).at[:, S:].set(False)
        start_rope = jnp.full((b,), S, jnp.int32)

        def run(tok0):
            toks, _ = m.greedy_decode(params, cfg, caches, tok0,
                                      jnp.int32(S), start_rope, NDEC,
                                      key_mask=key_mask)
            return toks

        t0 = time.perf_counter()
        out = run(first)
        _ = int(jnp.asarray(out).sum())
        log(f"  decode compile+first: {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            out = run((first + i + 1) % 1000)
            _ = int(jnp.asarray(out).sum())
            best = min(best, time.perf_counter() - t0)
        tok = best / NDEC
        log(f"  decode B={b}: {tok*1e3:6.2f} ms/token total "
            f"({tok/b*1e3:6.3f} ms/token/item; 1000 tok = "
            f"{tok/b*1000:6.3f} s/item)")
        del caches


if __name__ == "__main__":
    main()
