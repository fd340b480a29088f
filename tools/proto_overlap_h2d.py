"""Does a host->device upload overlap with device compute on the
tunnelled axon runtime?

The phase-swapped serving design (docs/SERVING.md, bench config #6)
evicts the idle model between the conditioning and denoise phases and
re-uploads it for the next phase.  If the upload rides a DMA stream that
overlaps MXU compute, the swap is free (hidden under the 79 s denoise /
the 13 s prompt-encode); if transfers serialize with compute, the swap
costs ~(restore bytes)/BW on the critical path and the break-even batch
size moves.

Method: a ~2 s chained-matmul jit program is dispatched (async), then a
2 GB device_put is issued and timed; both are then synced.  Compare
  t_total  vs  t_compute_alone + t_transfer_alone  (serialized)
               max(t_compute_alone, t_transfer_alone)  (overlapped)

Usage: python tools/proto_overlap_h2d.py [--gb 2] [--iters 400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"platform={dev.platform} device={dev}")

    n = 8192
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)) * 0.01,
                    jnp.bfloat16)

    @jax.jit
    def compute(a, salt, iters=args.iters):
        def body(x, _):
            x = jnp.tanh(x @ a)
            return x, ()
        x0 = a * (1.0 + salt)
        x, _ = lax.scan(body, x0, None, length=iters)
        return x

    nb = int(args.gb * 1e9)
    host = np.random.default_rng(1).integers(0, 255, size=(nb,),
                                             dtype=np.uint8)

    # warm the compiled program + one transfer
    fetch(compute(a, jnp.float32(0.01)))
    d = jax.device_put(host, dev)
    d.block_until_ready()
    del d

    # --- compute alone ---
    t0 = time.perf_counter()
    out = compute(a, jnp.float32(0.02))
    fetch(out)
    t_c = time.perf_counter() - t0
    log(f"compute alone: {t_c:.2f} s")

    # --- transfer alone ---
    host[0] ^= 0xFF
    t0 = time.perf_counter()
    d = jax.device_put(host, dev)
    d.block_until_ready()
    t_x = time.perf_counter() - t0
    del d
    log(f"transfer alone: {nb/1e9:.1f} GB in {t_x:.2f} s = "
        f"{nb/t_x/1e9:.2f} GB/s")

    # --- concurrent: dispatch compute, then upload ---
    for rep in range(3):
        host[rep + 1] ^= 0xFF
        t0 = time.perf_counter()
        out = compute(a, jnp.float32(0.03 + 0.01 * rep))  # async dispatch
        t_disp = time.perf_counter() - t0
        d = jax.device_put(host, dev)
        d.block_until_ready()
        t_xfer_done = time.perf_counter() - t0
        fetch(out)
        t_total = time.perf_counter() - t0
        del d
        log(f"rep{rep}: dispatch {t_disp*1e3:.0f} ms, transfer done at "
            f"{t_xfer_done:.2f} s, total {t_total:.2f} s  "
            f"(serial would be {t_c + t_x:.2f}, overlap {max(t_c, t_x):.2f})")


if __name__ == "__main__":
    main()
