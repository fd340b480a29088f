"""Int8 quantized linear: numerics and DiT integration."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops import quant


def test_int8_linear_accuracy():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 512)).astype(np.float32) / 16
    b = rng.normal(size=(512,)).astype(np.float32) * 0.01
    x = rng.normal(size=(4, 64, 256)).astype(np.float32)
    ref = x @ w + b
    p = dict(quant.quantize_weight(jnp.asarray(w)), b=jnp.asarray(b))
    out = np.asarray(quant.int8_linear(p, jnp.asarray(x)))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()  # ~1% typical W8A8 error


def test_linear_dispatches_on_quant_leaf():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    p_q = quant.quantize_weight(w)
    np.testing.assert_allclose(np.asarray(linear(p_q, x)),
                               np.asarray(quant.int8_linear(p_q, x)))


@pytest.mark.slow
def test_quantized_dit_forward_close_to_fp32():
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    cfg = jdit.DiTConfig(num_layers=2, dim=128, num_heads=2, head_dim=64,
                         txt_in_dim=64, patch_dim=64, time_dim=32)
    params = jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quant.quantize_tree(params, min_size=1024)

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 16, 64)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, 6, 64)).astype(np.float32))
    t = jnp.asarray([0.4])
    ropes = jrope.build_rope_tables([(1, 4, 4)], 6, axes_dim=(16, 24, 24))
    ref = np.asarray(jdit.dit_forward(params, cfg, img, txt, t,
                                      *map(jnp.asarray, ropes)))
    out = np.asarray(jdit.dit_forward(qparams, cfg, img, txt, t,
                                      *map(jnp.asarray, ropes)))
    # int8 over 2 blocks: relative error stays small
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.1


@pytest.mark.slow  # heavy e2e; fast siblings cover the module
def test_quantized_pipeline_edit():
    """Full tiny edit with an int8-quantized DiT (the quantize="int8" path)."""
    from PIL import Image

    from physicedit_tpu.ops.quant import quantize_tree
    from tests.test_pipeline_e2e import build_tiny_pipeline

    pipe = build_tiny_pipeline()
    pipe.dit_params = quantize_tree(pipe.dit_params, min_size=1024)
    rng = np.random.default_rng(0)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out = pipe("nudge the box", edit_image=edit, height=64, width=64, seed=1,
               num_inference_steps=2, have_text_reasoning=False,
               edit_image_auto_resize=False)
    assert out.size == (64, 64)
    assert np.isfinite(np.asarray(out)).all()
