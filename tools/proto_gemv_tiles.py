"""Block-size sweep for the W4A8 GEMV kernel at the decode shapes.

The decode GEMV chain (28 layers x 4 fused projections) measures ~8.5
ms/token at B=8 against a 3.98 ms weight-read floor (tools/
proto_decode_unroll.py + bisect_decode.py).  The default picker chooses
(bm=8, bn<=512, bk2<=256) -> 131 KB weight tiles; this sweeps larger
tiles per shape to find the HBM-saturating configuration.

Shapes (fused decode projections, Qwen2.5-VL-7B, K x N):
  qkv      3584 x 4608
  o        3584 x 3584
  gate_up  3584 x 37888
  down    18944 x 3584
  lm_head  3584 x 151936

Usage: python tools/proto_gemv_tiles.py [--m 8]
"""

import argparse
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
from physicedit_tpu.kernels import quant_matmul as qm


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SHAPES = [
    ("qkv", 3584, 4608),
    ("o", 3584, 3584),
    ("gate_up", 3584, 37888),
    ("down", 18944, 3584),
    ("lm_head", 3584, 151936),
]


def divisors(dim, cands):
    return [c for c in cands if dim % c == 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    m = args.m
    bm = max(8, ((m + 7) // 8) * 8)

    for name, k, n in SHAPES:
        k2 = k // 2
        packed = jnp.asarray(rng.integers(-128, 127, size=(k2, n)), jnp.int8)
        wsb = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32) * 0.01)
        xq = jnp.asarray(rng.integers(-127, 127, size=(bm, k)), jnp.int8)
        xs = jnp.asarray(np.abs(rng.normal(size=(bm, 1))).astype(np.float32))
        gb = k2 * n / 1e9
        best = (None, float("inf"))
        rows = []
        for bn in divisors(n, (n, 9472, 8192, 4736, 4608, 4096, 3584, 2048,
                               1792, 1024, 512)):
            for bk2 in divisors(k2, (k2, 4736, 2368, 1792, 896, 512, 448,
                                     256)):
                if bn * bk2 > 8 * 1024 * 1024:   # 8 MB int8 tile cap
                    continue
                if bn * bk2 < 2 * 256 * 256:
                    continue
                def step(c, bn=bn, bk2=bk2):
                    out = qm._w4a8_matmul(c[0], packed, c[1], wsb,
                                          jnp.bfloat16, block_m=bm,
                                          block_n=bn, block_k2=bk2,
                                          variant="and")
                    # shape-preserving data-dependent chain: the output
                    # perturbs the activation scales of the next call
                    return (c[0],
                            c[1] + out[:, :1].astype(jnp.float32) * 1e-6)

                try:
                    # single GEMVs are tens of us; the tunnel's per-launch
                    # round trip is ~3.5 ms — chain long enough to amortise
                    t = chain_time(step, (xq, xs), chain=256, reps=2,
                                   fetch_leaf=lambda c: c[1])
                except Exception as e:  # noqa: BLE001
                    rows.append(f"    bn={bn:6d} bk2={bk2:5d}: FAIL "
                                f"{type(e).__name__}")
                    continue
                rows.append(f"    bn={bn:6d} bk2={bk2:5d}: {t*1e6:7.0f} us "
                            f"({gb/t:6.0f} GB/s)")
                if t < best[1]:
                    best = ((bn, bk2), t)
        log(f"{name} K={k} N={n} ({gb*1e3:.0f} MB): best {best[0]} "
            f"{best[1]*1e6:.0f} us ({gb/best[1]:.0f} GB/s)")
        for r in rows:
            log(r)


if __name__ == "__main__":
    main()
