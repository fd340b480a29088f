"""Same-process head-to-head: bias fixed-max kernel vs zero-key fixed-max
at the production DiT attention workload (B=2, N=24, S=8448, D=128).

The tunnelled runtime drifts ~10% run to run, so cross-run comparisons of
absolute ms are unreliable — this times both kernels interleaved.

Usage: python tools/proto_zk_vs_bias.py
"""

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
from physicedit_tpu.kernels import flash_attention as fa


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    b, n, s, d = 2, 24, 8448, 128
    q0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    k0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(b, n, s, d)) * 0.1, jnp.bfloat16)
    mask_np = np.ones((b, s), bool)
    mask_np[:, -64:] = False
    mask = jnp.asarray(mask_np)
    key_bias = jnp.where(mask[:, None, :], 0.0, fa.NEG_INF
                         ).astype(jnp.float32)
    flops = 4 * b * n * s * s * d

    def run_bias(c, bq, bk, clamp):
        qs = c[0] * jnp.asarray(fa.LOG2E / (d ** 0.5), c[0].dtype)
        o = fa._fixedmax_bnsd(qs, c[1], c[2], key_bias, bq, bk,
                              clamp=clamp, prescaled=True)
        return (o * 0.999, c[1], c[2])

    def run_zk(c, bq, bk, clamp):
        qs = c[0] * jnp.asarray(fa.LOG2E / (d ** 0.5), c[0].dtype)
        mk = mask[:, None, :, None]
        kz = jnp.where(mk, c[1], 0)
        vz = jnp.where(mk, c[2], 0)
        nm = jnp.broadcast_to(
            jnp.sum(~mask, axis=-1).astype(jnp.float32)[:, None, None],
            (b, 8, 128))
        o = fa._fixedmax_zk_diff(qs, kz, vz, nm, bq, bk, clamp)
        return (o * 0.999, c[1], c[2])

    init = (q0, k0, v0)
    for bq, bk in [(768, 2816), (1408, 1408)]:
        for clamp in (False, True):
            for name, fn in (("bias", run_bias), ("zk  ", run_zk)):
                try:
                    t = chain_time(
                        lambda c, fn=fn, bq=bq, bk=bk, clamp=clamp:
                        fn(c, bq, bk, clamp), init, chain=6)
                    log(f"{name} bq={bq:4d} bk={bk:4d} clamp={int(clamp)}: "
                        f"{t*1e3:6.2f} ms ({flops/t/1e12:5.1f} TF)")
                except Exception as e:  # noqa: BLE001
                    log(f"{name} bq={bq:4d} bk={bk:4d} clamp={int(clamp)}: "
                        f"FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
