"""Measure host->device and device->host transfer bandwidth through the
tunnelled runtime, plus on-device HBM copy rate.

Motivation: sweep serving is HBM-residency-bound (bench.memory_budget):
the DiT (10.25 GB W4) sits idle during the conditioning phase and the VL
reasoner (4.6 GB) sits idle during denoise.  If host<->device transfer is
fast enough, phase-evicting the idle model unlocks much larger reasoner
decode batches (the decode is weight-read-bound; per-item cost ~1/B).
The break-even: evicting+restoring the DiT costs 2x10.25 GB / BW per
serving batch, amortised over nb items.

Usage: python tools/measure_transfer.py [--gb 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"platform={dev.platform} device={dev}")
    n = int(args.gb * 1e9)
    host = np.random.default_rng(0).integers(0, 255, size=(n,),
                                             dtype=np.uint8)

    # host -> device (cold + 3 reps; perturb one byte so the runtime
    # cannot dedup identical buffers)
    for i in range(4):
        host[i] ^= 0xFF
        t0 = time.perf_counter()
        d = jax.device_put(host, dev)
        d.block_until_ready()
        dt = time.perf_counter() - t0
        log(f"h2d rep{i}: {n/1e9:.1f} GB in {dt:.2f} s = {n/dt/1e9:.2f} GB/s")

    # device -> host
    for i in range(3):
        t0 = time.perf_counter()
        h = np.asarray(d)
        dt = time.perf_counter() - t0
        log(f"d2h rep{i}: {n/1e9:.1f} GB in {dt:.2f} s = {n/dt/1e9:.2f} GB/s"
            f" (sum={int(h[:16].sum())})")
        d = jax.device_put(host, dev)
        d.block_until_ready()

    # on-device copy (donated reshape-free op) for scale
    f = jax.jit(lambda x: x + jnp.uint8(1))
    x = f(d)
    x.block_until_ready()
    for i in range(3):
        t0 = time.perf_counter()
        x = f(x)
        x.block_until_ready()
        dt = time.perf_counter() - t0
        log(f"on-device rw rep{i}: {2*n/dt/1e9:.1f} GB/s effective")


if __name__ == "__main__":
    main()
