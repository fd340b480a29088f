"""LoRA: factors-on-activations == offline weight merge; format roundtrip."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.models import dit as jdit
from physicedit_tpu.ops import rope as jrope
from physicedit_tpu import lora as jlora
from physicedit_tpu.io.convert import dit_from_torch


def synth_torch_dit_sd(cfg: jdit.DiTConfig, seed=0):
    """Random state dict in the reference torch key space (numpy arrays)."""
    rng = np.random.default_rng(seed)
    d, td = cfg.dim, cfg.txt_in_dim

    def lin(out_d, in_d):
        return (rng.normal(size=(out_d, in_d)).astype(np.float32) / np.sqrt(in_d),
                rng.normal(size=(out_d,)).astype(np.float32) * 0.01)

    sd = {}

    def put(name, out_d, in_d):
        w, b = lin(out_d, in_d)
        sd[name + ".weight"] = w
        sd[name + ".bias"] = b

    put("img_in", d, cfg.patch_dim)
    sd["txt_norm.weight"] = rng.normal(size=(td,)).astype(np.float32) * 0.1 + 1
    put("txt_in", d, td)
    put("time_text_embed.timestep_embedder.linear_1", d, cfg.time_dim)
    put("time_text_embed.timestep_embedder.linear_2", d, d)
    put("norm_out.linear", 2 * d, d)
    put("proj_out", cfg.patch_dim, d)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        put(f"{b}.img_mod.1", 6 * d, d)
        put(f"{b}.txt_mod.1", 6 * d, d)
        for m in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            put(f"{b}.attn.{m}", d, d)
        for m in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{b}.attn.{m}.weight"] = (
                rng.normal(size=(cfg.head_dim,)).astype(np.float32) * 0.1 + 1)
        put(f"{b}.attn.to_out.0", d, d)
        put(f"{b}.attn.to_add_out", d, d)
        put(f"{b}.img_mlp.net.0.proj", cfg.mlp_dim, d)
        put(f"{b}.img_mlp.net.2", d, cfg.mlp_dim)
        put(f"{b}.txt_mlp.net.0.proj", cfg.mlp_dim, d)
        put(f"{b}.txt_mlp.net.2", d, cfg.mlp_dim)
    return sd


def _random_lora(cfg, rank=4, seed=1):
    lora = jlora.init_dit_lora(jax.random.PRNGKey(seed), cfg, rank=rank)
    # make B nonzero so the delta actually does something
    keys = iter(jax.random.split(jax.random.PRNGKey(seed + 1), 16))
    return jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(next(keys), x.shape, x.dtype), lora)


@pytest.mark.slow
def test_lora_forward_equals_merged_weights():
    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    sd = synth_torch_dit_sd(cfg)
    lora = _random_lora(cfg)

    # Path A: base params + factors at forward time.
    params = dit_from_torch(sd, dtype=jnp.float32)

    # Path B: export factors to the reference format, merge into weights.
    lora_sd = jlora.export_dit_lora(lora, prefix="")
    merged_sd = jlora.merge_lora_into_state_dict(sd, lora_sd)
    params_merged = dit_from_torch(merged_sd, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    b, s_i, s_t = 1, 16, 5
    img = jnp.asarray(rng.normal(size=(b, s_i, cfg.patch_dim)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(b, s_t, cfg.txt_in_dim)).astype(np.float32))
    t = jnp.asarray([0.4])
    ic, isn, tc, ts = jrope.build_rope_tables([(1, 4, 4)], s_t, axes_dim=(8, 12, 12))

    out_factors = jdit.dit_forward(params, cfg, img, txt, t, ic, isn, tc, ts,
                                   lora=lora)
    out_merged = jdit.dit_forward(params_merged, cfg, img, txt, t, ic, isn, tc, ts)
    np.testing.assert_allclose(np.asarray(out_factors), np.asarray(out_merged),
                               rtol=2e-4, atol=2e-4)


def test_lora_import_export_roundtrip():
    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32)
    lora = _random_lora(cfg, rank=3)
    sd = jlora.export_dit_lora(lora, prefix="pipe.dit.")
    # validate.py-style split: all keys are lora keys here
    lora_sd, pipe_sd = jlora.split_finetuned_checkpoint(sd)
    assert not pipe_sd
    stripped = {k[len("pipe.dit."):]: v for k, v in lora_sd.items()}
    back = jlora.import_dit_lora(stripped, cfg)
    for name in lora:
        np.testing.assert_allclose(np.asarray(back[name]["A"]),
                                   np.asarray(lora[name]["A"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back[name]["B"]),
                                   np.asarray(lora[name]["B"]), rtol=1e-6)


def test_pipeline_load_lora_offline_equals_hotload(tmp_path):
    """pipeline.load_lora: pytree-level fold == live factors."""
    from safetensors.numpy import save_file

    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.pipeline.edit_pipeline import _merge_lora_pytree

    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    sd = synth_torch_dit_sd(cfg)
    params = dit_from_torch(sd, dtype=jnp.float32)
    lora = _random_lora(cfg, rank=3, seed=5)

    merged = _merge_lora_pytree(params, lora, alpha=1.0)

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 16, 64)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, 5, 48)).astype(np.float32))
    t = jnp.asarray([0.5])
    ropes = jrope.build_rope_tables([(1, 4, 4)], 5, axes_dim=(8, 12, 12))
    out_factors = jdit.dit_forward(params, cfg, img, txt, t,
                                   *map(jnp.asarray, ropes), lora=lora)
    out_merged = jdit.dit_forward(merged, cfg, img, txt, t,
                                  *map(jnp.asarray, ropes))
    np.testing.assert_allclose(np.asarray(out_factors), np.asarray(out_merged),
                               rtol=2e-4, atol=2e-4)


def test_init_dit_lora_respects_dtype():
    """Regression: the Kaiming 1/sqrt(in) scale used to be a NumPy scalar,
    which silently promoted bf16 A-factors to fp32 — lora_dtype=bfloat16
    then only halved the B factors (1.7 GB extra at r=128)."""
    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    for dt in (jnp.float32, jnp.bfloat16):
        lora = jlora.init_dit_lora(jax.random.PRNGKey(0), cfg, rank=4,
                                   dtype=dt)
        dts = {str(l.dtype) for l in jax.tree_util.tree_leaves(lora)}
        assert dts == {str(jnp.dtype(dt))}, dts


def test_collect_pairs_strips_diffusion_model_prefix():
    """Opensource-format keys (leading `diffusion_model.`, no `.default.`)
    resolve to the same modules as peft-format keys — the reference's
    GeneralLoRALoader.get_name_dict semantics (diffsynth/lora/__init__.py:13-25)."""
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal((4, 8), np.float32), rng.standard_normal((8, 4), np.float32)
    peft = {
        "transformer_blocks.0.attn.to_q.lora_A.default.weight": a,
        "transformer_blocks.0.attn.to_q.lora_B.default.weight": b,
    }
    opensource = {
        "diffusion_model.transformer_blocks.0.attn.to_q.lora_A.weight": a,
        "diffusion_model.transformer_blocks.0.attn.to_q.lora_B.weight": b,
    }
    p1 = jlora.collect_lora_pairs(peft)
    p2 = jlora.collect_lora_pairs(opensource)
    assert list(p1) == list(p2) == ["transformer_blocks.0.attn.to_q"]
    np.testing.assert_array_equal(p1[list(p1)[0]]["A"], p2[list(p2)[0]]["A"])

    sd = {"transformer_blocks.0.attn.to_q.weight": np.zeros((8, 8), np.float32)}
    merged = jlora.merge_lora_into_state_dict(sd, opensource, alpha=2.0)
    np.testing.assert_allclose(
        merged["transformer_blocks.0.attn.to_q.weight"], 2.0 * (b @ a), rtol=1e-6)
