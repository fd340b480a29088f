"""Shared chained-launch timing helper for the measurement tools.

The tunnelled axon runtime dedups launches whose argument contents are
bit-identical and `block_until_ready` returns early on queued dispatch
chains, so every measurement is a DATA-DEPENDENT chain of `chain`
iterations inside one jit call, synced by a value fetch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain_time(step_fn, init, chain: int = 8, reps: int = 3,
               fetch_leaf=None):
    """step_fn: x -> x (same pytree shape).  Returns seconds per step."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, chain, lambda _, x: step_fn(x), x)

    def sync(x):
        leaf = fetch_leaf(x) if fetch_leaf else (
            x[0] if isinstance(x, tuple) else x)
        return float(jnp.asarray(leaf).astype(jnp.float32).sum())

    x = run(init)
    sync(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x)
        sync(y)
        best = min(best, (time.perf_counter() - t0) / chain)
        x = y
    return best
