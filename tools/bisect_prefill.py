"""Bisect the W4 VL prefill cost at B=8 S=1536: GEMM stack vs attention
vs glue.  Chained in-jit calls, value-fetch sync (tunnel discipline)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physicedit_tpu.core.params import random_tree_like
from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4, w4a8_linear
from physicedit_tpu.models import qwen_vl as m

B = int(os.environ.get("BISECT_B", "8"))
S = 1536
CFG = m.QWEN25_VL_7B_TEXT
DT = jnp.bfloat16


def timeit(f, x, tag, reps=4):
    out = f(x)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :8], np.float32)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = f(x * (1.0 + 0.01 * (i + 1)))
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :8], np.float32)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts)*1e3:.0f} ms", flush=True)
    return min(ts)


def main():
    shapes = jax.eval_shape(lambda: m.fuse_decode_projections(
        quantize_tree_int4(m.init_text_params(jax.random.PRNGKey(0), CFG, DT))))
    params = random_tree_like(2, shapes)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, S, CFG.hidden_size)) * 0.1, DT)

    lp = params["layers"]

    # (a) GEMM-only stack: per layer qkv + o + gate_up + down on [B*S, .]
    @jax.jit
    def gemms(x):
        def body(x, layer):
            h = x.reshape(B * S, CFG.hidden_size)
            qkv = w4a8_linear(layer["qkv"], h)
            o_in = qkv[:, : CFG.num_heads * CFG.head_dim]
            xo = w4a8_linear(layer["o"], o_in)
            gu = w4a8_linear(layer["mlp"]["gate_up"], h)
            g, u = jnp.split(gu, 2, axis=-1)
            dn = w4a8_linear(layer["mlp"]["down"], jax.nn.silu(g) * u)
            nxt = (x + 1e-3 * (xo + dn).reshape(B, S, -1)).astype(x.dtype)
            return nxt, None
        x, _ = jax.lax.scan(body, x, lp)
        return x

    # (b) full prefill
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
    attn = jnp.ones((B, S), bool)

    def prefill_f(x):
        logits, _, _ = m.prefill(params, CFG, x, pos, attn, S + 64)
        return logits

    timeit(gemms, x0, f"(a) GEMM-only 28-layer stack B={B}")
    timeit(jax.jit(prefill_f), x0, f"(b) full prefill B={B}")


if __name__ == "__main__":
    main()
