"""Random/zero initialisation of the VAE pytree (tests and benchmarks).

Real weights come from io/convert.vae_from_torch; this module only builds a
structurally identical pytree so shape/speed tests don't need a checkpoint.
"""

from __future__ import annotations

import jax.numpy as jnp

from physicedit_tpu.models.vae import VAEConfig, QWEN_VAE_CONFIG


def _conv(cin, cout, k, dtype):
    return {"w": jnp.zeros((k, k, cin, cout), dtype), "b": jnp.zeros((cout,), dtype)}


def _norm(c, dtype):
    return {"gamma": jnp.ones((c,), dtype)}


def _res(cin, cout, dtype):
    p = {"norm1": _norm(cin, dtype), "conv1": _conv(cin, cout, 3, dtype),
         "norm2": _norm(cout, dtype), "conv2": _conv(cout, cout, 3, dtype)}
    if cin != cout:
        p["shortcut"] = _conv(cin, cout, 1, dtype)
    return p


def _mid(c, dtype):
    return {
        "res0": _res(c, c, dtype),
        "attn": {"norm": _norm(c, dtype), "to_qkv": _conv(c, 3 * c, 1, dtype),
                 "proj": _conv(c, c, 1, dtype)},
        "res1": _res(c, c, dtype),
    }


def init_vae_params(cfg: VAEConfig = QWEN_VAE_CONFIG, dtype=jnp.float32):
    enc_dims = cfg.enc_dims
    enc_stages = []
    for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        res = [_res(cin, cout, dtype)]
        for _ in range(cfg.num_res_blocks - 1):
            res.append(_res(cout, cout, dtype))
        stage = {"res": res}
        if i != len(cfg.dim_mult) - 1:
            stage["down"] = _conv(cout, cout, 3, dtype)
        enc_stages.append(stage)

    dec_dims = cfg.dec_dims
    dec_stages = []
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        if i > 0:
            cin = cin // 2
        res = [_res(cin, cout, dtype)]
        for _ in range(cfg.num_res_blocks):
            res.append(_res(cout, cout, dtype))
        stage = {"res": res}
        if i != len(cfg.dim_mult) - 1:
            stage["up"] = _conv(cout, cout // 2, 3, dtype)
        dec_stages.append(stage)

    z2 = cfg.z_dim * 2
    return {
        "encoder": {
            "conv_in": _conv(3, enc_dims[0], 3, dtype),
            "stages": enc_stages,
            "mid": _mid(enc_dims[-1], dtype),
            "norm_out": _norm(enc_dims[-1], dtype),
            "conv_out": _conv(enc_dims[-1], z2, 3, dtype),
        },
        "decoder": {
            "conv_in": _conv(cfg.z_dim, dec_dims[0], 3, dtype),
            "mid": _mid(dec_dims[0], dtype),
            "stages": dec_stages,
            "norm_out": _norm(dec_dims[-1], dtype),
            "conv_out": _conv(dec_dims[-1], 3, 3, dtype),
        },
        "quant_conv": _conv(z2, z2, 1, dtype),
        "post_quant_conv": _conv(cfg.z_dim, cfg.z_dim, 1, dtype),
    }
