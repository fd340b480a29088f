"""EliGen entity-control: mask builder semantics + pipeline integration."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from physicedit_tpu.pipeline import eligen as EL


def test_entity_bias_structure():
    # two entities over a 4x4 latent grid (-> 2x2 = 4 image tokens)
    m1 = np.zeros((4, 4), bool); m1[:2, :2] = True     # token 0
    m2 = np.zeros((4, 4), bool); m2[2:, 2:] = True     # token 3
    seq_lens = [2, 3, 4]  # entity1, entity2, global
    bias = EL.build_entity_bias([m1, m2], seq_lens, image_seq_len=4,
                                base_image_tokens=4)
    assert bias.shape == (13, 13)
    t = 9  # image tokens start
    # entity1 prompt (rows 0..1) may attend image token 0 only
    assert (bias[0, t + 0] == 0) and (bias[0, t + 1] < -1e29)
    assert (bias[0, t + 3] < -1e29)
    # entity2 prompt (rows 2..4) may attend image token 3 only
    assert (bias[2, t + 3] == 0) and (bias[2, t + 0] < -1e29)
    # global prompt (rows 5..8) sees every image token
    assert (bias[5, t:t + 4] == 0).all()
    # prompt groups are mutually invisible
    assert (bias[0, 2:5] < -1e29).all() and (bias[2, 0:2] < -1e29).all()
    assert (bias[5, 0:5] < -1e29).all()
    # image <-> entity symmetry
    assert bias[t + 0, 0] == 0 and bias[t + 1, 0] < -1e29
    # image tokens attend each other
    assert (bias[t:, t:] == 0).all()


def test_entity_bias_tiles_over_edit_tokens():
    m = np.zeros((4, 4), bool); m[:2, :2] = True
    bias = EL.build_entity_bias([m], [2, 3], image_seq_len=8,
                                base_image_tokens=4)
    t = 5
    # mask tiles over the second (edit) image block
    assert bias[0, t + 0] == 0 and bias[0, t + 4] == 0
    assert bias[0, t + 1] < -1e29 and bias[0, t + 5] < -1e29


@pytest.mark.slow  # heavy e2e; fast siblings cover the module
def test_pipeline_with_eligen_runs():
    from tests.test_pipeline_e2e import build_tiny_pipeline

    pipe = build_tiny_pipeline()
    rng = np.random.default_rng(0)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    mask = Image.fromarray(
        (np.kron(np.array([[1, 0], [0, 0]]), np.ones((32, 32))) * 255
         ).astype(np.uint8))
    out = pipe("move the cup", edit_image=edit, height=64, width=64, seed=1,
               num_inference_steps=2, have_text_reasoning=False,
               edit_image_auto_resize=False,
               eligen_entity_prompts=["a red cup"],
               eligen_entity_masks=[mask])
    assert out.size == (64, 64)
    assert np.isfinite(np.asarray(out)).all()

    # cfg_truncate composes with entity control: the positive-only late
    # lane must slice the per-CFG-row text rope tables (regression for a
    # trace-time shape mismatch at the truncation step).
    out_t = pipe("move the cup", edit_image=edit, height=64, width=64,
                 seed=1, num_inference_steps=2, have_text_reasoning=False,
                 edit_image_auto_resize=False,
                 eligen_entity_prompts=["a red cup"],
                 eligen_entity_masks=[mask], cfg_truncate_step=1)
    assert out_t.size == (64, 64)
    assert np.isfinite(np.asarray(out_t)).all()


def test_flash_bias_kernel_matches_xla():
    import functools
    import jax
    from jax.experimental import pallas as pl

    from physicedit_tpu.kernels import flash_attention as fa
    from physicedit_tpu.ops.attention import sdpa_bnsd

    orig = pl.pallas_call
    rng = np.random.default_rng(1)
    b, n, s, d = 1, 2, 256, 128
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    bias = np.where(rng.random((b, s, s)) < 0.2, -1e30, 0.0).astype(np.float32)
    # keep at least one visible key per row
    bias[:, :, 0] = 0.0
    bias = jnp.asarray(bias)

    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = fa.flash_attention_bnsd(q, k, v, bias=bias,
                                      block_q=128, block_k=128)
    finally:
        pl.pallas_call = orig
    ref = sdpa_bnsd(q, k, v, bias=bias[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_eligen_on_quantized_pipeline():
    """EliGen segments + the W4A8 fused activation-quantize paths compose:
    the per-CFG-row text rope and the entity attention bias must survive
    the packed-int4 dispatch."""
    from tests.test_pipeline_e2e import build_tiny_pipeline
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4

    pipe = build_tiny_pipeline()
    pipe.dit_params = quantize_tree_int4(pipe.dit_params, min_size=1)
    rng = np.random.default_rng(1)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    mask = Image.fromarray(
        (np.kron(np.array([[0, 1], [0, 0]]), np.ones((32, 32))) * 255
         ).astype(np.uint8))
    out = pipe("swap the mug", edit_image=edit, height=64, width=64, seed=2,
               num_inference_steps=2, have_text_reasoning=False,
               edit_image_auto_resize=False,
               eligen_entity_prompts=["a blue mug"],
               eligen_entity_masks=[mask])
    assert out.size == (64, 64)
    assert np.isfinite(np.asarray(out)).all()
