"""Head-to-head variants of the quantized DiT block at the production
workload (B=2, S=8448): W4A8 impl (pallas fused vs xla unpack+dot) x
attention block sizes.  Chained-launch timing (tunnelled runtime dedups
bit-identical launches; value-fetch sync).

Usage: python tools/measure_w4_block.py [--attn-sweep]
"""

import argparse
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


from tools._bench import chain_time as _ct  # noqa: E402


def chain_time(step_fn, init, reps=3):
    return _ct(step_fn, init, chain=6, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn-sweep", action="store_true")
    args = ap.parse_args()

    from physicedit_tpu.core.params import random_tree_like
    from physicedit_tpu.kernels import quant_matmul as qm
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    rng = np.random.default_rng(0)
    cfg = jdit.DiTConfig(num_layers=1)
    shapes = jax.eval_shape(lambda: qm.quantize_tree_int4(
        jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)))
    params = random_tree_like(1, shapes)
    blk = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])

    b, grid, s_t = 2, 64, 256
    img_cos, img_sin, txt_cos, txt_sin = map(jnp.asarray, jrope.build_rope_tables(
        [(1, grid, grid), (1, grid, grid)], s_t))
    joint_mask = jnp.ones((b, 2 * grid * grid + s_t), bool)
    temb = jnp.full((b, 3072), 0.1, jnp.bfloat16)

    init = (jnp.asarray(rng.normal(size=(b, s_t, 3072)) * 0.1, jnp.bfloat16),
            jnp.asarray(rng.normal(size=(b, 2 * grid * grid, 3072)) * 0.1,
                        jnp.bfloat16))

    def block_step(carry):
        text, image = carry
        text, image = jdit.block_forward(
            blk, cfg, image, text, temb, img_cos, img_sin, txt_cos,
            txt_sin, joint_mask, attn_impl="pallas")
        return (jnp.nan_to_num(text * 0.999, nan=0.01),
                jnp.nan_to_num(image * 0.999, nan=0.01))

    for impl in ("pallas", "xla"):
        qm.set_w4a8_impl(impl)
        s = chain_time(block_step, init)
        log(f"W4A8 block, impl={impl:6s}: {s*1e3:6.2f} ms")
    qm.set_w4a8_impl("pallas")

    if args.attn_sweep:
        from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd

        s_all = 2 * grid * grid + s_t
        q0 = jnp.asarray(rng.normal(size=(b, 24, s_all, 128)) * 0.1,
                         jnp.bfloat16)
        mask = jnp.ones((b, s_all), bool)
        att_flops = 4 * b * 24 * s_all * s_all * 128
        # v5e VMEM is 128 MB — the large-tile configs (p tile = bq*bk*4
        # bytes) are well inside it; fewer grid programs amortise the
        # MXU/VPU phase switches.
        for bq, bk in [(1408, 1408), (768, 2816),
                       (2816, 1408), (1408, 2816), (2816, 2816),
                       (4224, 1408), (1408, 4224), (8448, 1408),
                       (2816, 4224), (4224, 2816)]:
            for clamp in (True, False):
                try:
                    def astep(c, bq=bq, bk=bk, clamp=clamp):
                        o = flash_attention_bnsd(c[0], c[0], c[0],
                                                 key_mask=mask,
                                                 block_q=bq, block_k=bk,
                                                 clamp=clamp)
                        return (o * 0.999, c[1])

                    s = chain_time(astep, (q0, q0))
                    log(f"flash bq={bq:4d} bk={bk:4d} clamp={int(clamp)}: "
                        f"{s*1e3:6.2f} ms ({att_flops/s/1e12:5.1f} TFLOPS)")
                except Exception as e:  # noqa: BLE001
                    log(f"flash bq={bq} bk={bk} clamp={int(clamp)}: "
                        f"FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
