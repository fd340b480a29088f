"""Measure the reasoner lane at its TRUE prompt bucket.

The reasoner prompt is system(~180 tok) + image(196 merged) +
Picture+instruction(~50-120) ~= 430-500 tokens -> /128 bucket 512, not
the 1536 the round-2 bench charged (1536 is the PROMPT-ENCODE bucket,
whose rows append the <=1000-token reasoning text).  Cache rows go
512+1000 = 1512 (44 MB/item int8) vs 2536 (74 MB/item): the serving
batch the cache budget admits nearly doubles.

Measures: prefill at S=512 (B=1..4), greedy decode at B=8/16/20/24 with
max_total=1512 int8 caches.

Usage: python tools/proto_reasoner_bucket.py
"""

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    from physicedit_tpu.core.params import random_tree_like, tree_size_bytes
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
    from physicedit_tpu.models import qwen_vl as m

    cfg = dataclasses.replace(m.QWEN25_VL_7B_TEXT, eos_token_id=-1)
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: m.fuse_decode_projections(
        quantize_tree_int4(m.init_text_params(jax.random.PRNGKey(0), cfg,
                                              dtype))))
    params = random_tree_like(2, shapes)
    log(f"vl params: {tree_size_bytes(params)/1e9:.2f} GB")

    s = 512
    max_total = s + 1000
    rng = np.random.default_rng(0)
    for b in (1, 2, 4, 8, 16, 20, 24):
        pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, b, s))
        attn = jnp.ones((b, s), bool)
        emb0 = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.1,
                           dtype)
        fetch(emb0)

        def prefill_once(i, b=b, pos=pos, attn=attn, emb0=emb0):
            emb = emb0 * jnp.bfloat16(1.0 + 0.03 * i)
            t0 = time.perf_counter()
            logits, caches, _ = m.prefill(params, cfg, emb, pos, attn,
                                          max_total, kv_int8=True)
            fetch(logits)
            return time.perf_counter() - t0, logits, caches

        prefill_once(0)
        prefill_s, logits, caches = prefill_once(1)
        for i in range(2, 9):
            t, logits, caches = prefill_once(i)
            prefill_s = min(prefill_s, t)
        if b > 4:
            n_dec = 32
            first = jnp.argmax(logits, -1).astype(jnp.int32)
            key_mask = jnp.concatenate(
                [attn, jnp.zeros((b, max_total - s), bool)], 1)

            def decode_once(tok0, b=b, caches=caches, key_mask=key_mask):
                t0 = time.perf_counter()
                toks, _ = m.greedy_decode(params, cfg, caches, tok0, s,
                                          jnp.full((b,), s, jnp.int32),
                                          n_dec, key_mask=key_mask)
                fetch(toks)
                return time.perf_counter() - t0

            decode_once(first)
            per_tok = min(decode_once((first + i) % 1000)
                          for i in (1, 2, 3, 4)) / n_dec
            log(f"S={s} B={b}: prefill {prefill_s*1e3:6.1f} ms, decode "
                f"{per_tok*1e3:5.2f} ms/tok total "
                f"({per_tok/b*1e3:5.2f}/item; 1000 tok -> "
                f"{1000*per_tok/b:5.3f} s/item)")
            del caches
        else:
            log(f"S={s} B={b}: prefill {prefill_s*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
