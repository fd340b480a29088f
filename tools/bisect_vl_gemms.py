"""Per-GEMM W4A8 rates at the VL prefill shapes (B=8 S=1536 -> M=12288).

Each GEMM is timed as an 8-deep in-jit chain (output feeds a cheap
perturbation of the next input) to amortise the ~30 ms tunnel dispatch
floor; value-fetch sync per timed call.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from physicedit_tpu.kernels.quant_matmul import (quantize_weight_int4,
                                                 w4a8_linear)

M = int(os.environ.get("M", "12288"))
CHAIN = 8

SHAPES = {
    "qkv (3584->4608)": (3584, 4608),
    "o (3584->3584)": (3584, 3584),
    "gate_up (3584->37888)": (3584, 37888),
    "down (18944->3584)": (18944, 3584),
    # DiT reference points at the same M for comparison
    "dit qkv (3072->9216)": (3072, 9216),
    "dit fc1 (3072->12288)": (3072, 12288),
}


def main():
    rng = np.random.default_rng(0)
    for name, (k, n) in SHAPES.items():
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02,
                        jnp.bfloat16)
        p = quantize_weight_int4(w)
        x0 = jnp.asarray(rng.normal(size=(M, k)).astype(np.float32) * 0.1,
                         jnp.bfloat16)

        @jax.jit
        def chain(x, p=p, k=k):
            def body(x, _):
                y = w4a8_linear(p, x)
                # fold the [M, n] output back to [M, k] cheaply
                r = jnp.sum(y, axis=1, keepdims=True) * 1e-6
                return (x * 0.999 + r.astype(x.dtype)), None
            x, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return x

        out = chain(x0)
        _ = np.asarray(out[:1, :8], np.float32)
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            out = chain(x0 + jnp.bfloat16(0.01 * (i + 1)))
            _ = np.asarray(out[:1, :8], np.float32)
            ts.append(time.perf_counter() - t0)
        per = min(ts) / CHAIN
        tflop = 2 * M * k * n / 1e12
        print(f"{name}: {per*1e3:.2f} ms -> {tflop/per:.0f} TFLOPS "
              f"(M={M})", flush=True)


if __name__ == "__main__":
    main()
