"""Profile the greedy decode at B=8: where do the ms/token go?"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physicedit_tpu.core.params import random_tree_like
from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
from physicedit_tpu.models import qwen_vl as m

cfg = dataclasses.replace(m.QWEN25_VL_7B_TEXT, eos_token_id=-1)
DT = jnp.bfloat16
shapes = jax.eval_shape(lambda: m.fuse_decode_projections(
    quantize_tree_int4(m.init_text_params(jax.random.PRNGKey(0), cfg, DT))))
params = random_tree_like(2, shapes)
B, S, NDEC = 8, 1536, 32
rng = np.random.default_rng(0)
emb = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.1, DT)
pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
attn = jnp.ones((B, S), bool)
logits, caches, _ = m.prefill(params, cfg, emb, pos, attn, S + 1000)
first = jnp.argmax(logits, -1).astype(jnp.int32)
key_mask = jnp.concatenate([attn, jnp.zeros((B, 1000 - 0), bool)], 1)
key_mask = jnp.concatenate([attn, jnp.zeros((B, (S + 1000) - S), bool)], 1)[:, :S + 1000]

def run(tok0):
    toks, _ = m.greedy_decode(params, cfg, caches, tok0, S,
                              jnp.full((B,), S, jnp.int32), NDEC,
                              key_mask=key_mask)
    return int(jnp.asarray(toks).sum())

run(first)
run((first + 1) % 1000)
with jax.profiler.trace("/tmp/jaxtrace_dec"):
    run((first + 2) % 1000)
print("traced", flush=True)
