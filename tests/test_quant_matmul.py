"""Packed-int4 W4A8 matmul kernel (interpreter mode on CPU)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from physicedit_tpu.core.params import linear
from physicedit_tpu.kernels import quant_matmul as qm


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _ref_w4_dequant(w):
    """Reference: quantize to int4 per-channel, dequantize in float."""
    wf = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(wf).max(0, keepdims=True) / 7.0, 1e-8)
    q = np.clip(np.round(wf / scale), -7, 7)
    return q * scale


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    p = qm.quantize_weight_int4(w)
    assert p["w4"].shape == (128, 128) and p["w4"].dtype == jnp.int8
    packed = np.asarray(p["w4"]).astype(np.int8)
    lo = (packed & 15) - 8          # offset-encoded low nibble (+8)
    hi = packed >> 4
    unpacked = np.concatenate([lo, hi], 0) * np.asarray(p["w_scale"])
    np.testing.assert_allclose(unpacked, _ref_w4_dequant(w), rtol=1e-5, atol=1e-6)


def test_w4a8_linear_matches_quantized_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    p = dict(qm.quantize_weight_int4(w))
    p["b"] = b
    out = qm.w4a8_linear(p, x)
    # reference: int8 row-quantized activations against dequantized int4 weights
    xq, xs = qm.quantize_rows(x)
    ref = (np.asarray(xq, np.float32) @ _ref_w4_dequant(w)) * np.asarray(xs) \
        + np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
    # and the end-to-end error vs the float matmul is int4-scale, not garbage
    exact = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.abs(np.asarray(out) - exact).mean() / np.abs(exact).mean()
    assert rel < 0.2, rel


def test_quantize_tree_int4_stacked_and_dispatch():
    rng = np.random.default_rng(2)
    tree = {
        "blocks": {
            "proj": {"w": jnp.asarray(rng.normal(size=(3, 512, 128)).astype(np.float32)),
                     "b": jnp.zeros((3, 128), jnp.float32)},
        },
        "small": {"w": jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))},
    }
    qt = qm.quantize_tree_int4(tree, min_size=1 << 12)
    assert "w4" in qt["blocks"]["proj"] and "w" not in qt["blocks"]["proj"]
    assert qt["blocks"]["proj"]["w4"].shape == (3, 256, 128)
    assert "w" in qt["small"]  # below threshold: untouched
    # dispatch through core.params.linear on one layer slice
    layer = jax.tree_util.tree_map(lambda a: a[1], qt["blocks"]["proj"])
    x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    out = linear(layer, x)
    exact = x @ tree["blocks"]["proj"]["w"][1]
    rel = np.abs(np.asarray(out) - np.asarray(exact)).mean() \
        / np.abs(np.asarray(exact)).mean()
    assert out.shape == (4, 128) and rel < 0.2


def test_w4a8_backward_straight_through():
    """dx through w4a8_linear matches autodiff of x @ dequant(W) (the
    straight-through estimator); frozen-weight cotangents are zero-typed."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 16, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    p = dict(qm.quantize_weight_int4(w))
    p["b"] = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    gsum = jnp.asarray(rng.normal(size=(3, 16, 128)).astype(np.float32))

    def loss(x):
        return jnp.sum(qm.w4a8_linear(p, x) * gsum)

    dx = jax.grad(loss)(x)
    w_deq = jnp.asarray(_ref_w4_dequant(w))

    def loss_ref(x):
        return jnp.sum((x @ w_deq + p["b"]) * gsum)

    dx_ref = jax.grad(loss_ref)(x)
    # backward runs in bf16 (standard training precision): ~0.5% relative
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-2, atol=8e-2)


@pytest.mark.slow  # heavy e2e; fast siblings cover the module
def test_w4a8_differentiable_in_composition():
    """LoRA-style composition: grads flow to the trainable factors through
    the frozen W4 layer in a deeper chain."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    p1 = qm.quantize_weight_int4(w1)
    A = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32) * 0.1)
    B = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32) * 0.1)

    def loss(A, B):
        h = qm.w4a8_linear(p1, x) + (x @ A) @ B
        h = jax.nn.gelu(h)
        return jnp.sum(qm.w4a8_linear(p1, h) ** 2)

    gA, gB = jax.grad(loss, argnums=(0, 1))(A, B)
    assert np.isfinite(np.asarray(gA)).all() and np.abs(np.asarray(gA)).max() > 0
    assert np.isfinite(np.asarray(gB)).all() and np.abs(np.asarray(gB)).max() > 0


# ---------------------------------------------------------------------------
# Fused activation-quantize kernels (kernels/fused_quant.py)
# ---------------------------------------------------------------------------

def test_ln_mod_quant_matches_unfused():
    from physicedit_tpu.kernels import fused_quant as fq
    from physicedit_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 128, 256)) * 0.7, jnp.bfloat16)
    shift = jnp.asarray(rng.normal(size=(2, 256)) * 0.2, jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(2, 256)) * 0.2, jnp.bfloat16)

    out = fq.ln_mod_quant(x, shift, scale, 1e-6)
    assert out is not None
    q, s = out

    y = (layer_norm(x, eps=1e-6) * (1.0 + scale[:, None, :])
         + shift[:, None, :])
    _, s_ref = qm.quantize_rows(y)
    # XLA keeps f32 through fused bf16 elementwise chains while the kernel
    # rounds per-op, so values differ by ~1 bf16 ulp — compare the fused
    # dequantized output against the pre-quantization value with a
    # half-quant-step + bf16-noise bound.
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    yf = np.asarray(y, np.float32)
    tol = 0.55 * np.asarray(s) + 0.02 * np.abs(yf)
    assert (np.abs(deq - yf) <= tol).all()


def test_gelu_quant_matches_unfused():
    from physicedit_tpu.kernels import fused_quant as fq
    from physicedit_tpu.ops.norms import approximate_gelu

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 64, 512)) * 2.0, jnp.bfloat16)
    out = fq.gelu_quant(x)
    assert out is not None
    q, s = out
    y = approximate_gelu(x)
    _, s_ref = qm.quantize_rows(y)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    yf = np.asarray(y, np.float32)
    tol = 0.55 * np.asarray(s) + 0.02 * np.abs(yf)
    assert (np.abs(deq - yf) <= tol).all()


def test_fused_quant_shape_fallbacks():
    from physicedit_tpu.kernels import fused_quant as fq

    x = jnp.zeros((2, 100, 120), jnp.bfloat16)  # K not /128
    assert fq.gelu_quant(x) is None
    x = jnp.zeros((2, 13, 256), jnp.bfloat16)   # S has no tile divisor
    assert fq.ln_mod_quant(x, jnp.zeros((2, 256), jnp.bfloat16),
                           jnp.zeros((2, 256), jnp.bfloat16)) is None


@pytest.mark.slow
def test_w4_block_fused_path_matches_unfused():
    """block_forward with the fused modulate/GELU->int8 path on vs off:
    same quantized math, near-identical outputs."""
    import jax as _jax
    from physicedit_tpu.core.params import random_tree_like
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    cfg = jdit.DiTConfig(num_layers=1, dim=256, num_heads=4, head_dim=64,
                         txt_in_dim=128)
    shapes = _jax.eval_shape(lambda: qm.quantize_tree_int4(
        jdit.init_dit_params(_jax.random.PRNGKey(0), cfg, jnp.bfloat16),
        min_size=1))
    params = random_tree_like(3, shapes)
    blk = _jax.tree_util.tree_map(lambda a: a[0], params["blocks"])

    rng = np.random.default_rng(9)
    b, grid, s_t = 2, 8, 64
    tabs = [jnp.asarray(t) for t in jrope.build_rope_tables(
        [(1, grid, grid)], s_t, axes_dim=(4, 30, 30))]
    mask = jnp.ones((b, grid * grid + s_t), bool)
    temb = jnp.asarray(rng.normal(size=(b, 256)) * 0.1, jnp.bfloat16)
    text = jnp.asarray(rng.normal(size=(b, s_t, 256)) * 0.5, jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(b, grid * grid, 256)) * 0.5,
                        jnp.bfloat16)

    def run():
        return jdit.block_forward(blk, cfg, image, text, temb, *tabs, mask)

    orig = jdit._FUSED_ACT_QUANT
    try:
        jdit._FUSED_ACT_QUANT = True
        t_f, i_f = run()
        jdit._FUSED_ACT_QUANT = False
        t_u, i_u = run()
    finally:
        jdit._FUSED_ACT_QUANT = orig
    np.testing.assert_allclose(np.asarray(i_f, np.float32),
                               np.asarray(i_u, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(t_f, np.float32),
                               np.asarray(t_u, np.float32),
                               rtol=0.05, atol=0.05)


def test_transpose_quant_matches_unfused():
    from physicedit_tpu.kernels import fused_quant as fq

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 4, 64, 128)) * 0.5, jnp.bfloat16)
    out = fq.transpose_quant(x)
    assert out is not None
    q, s = out
    y = jnp.transpose(x, (0, 2, 1, 3)).reshape(2, 64, 512)
    _, s_ref = qm.quantize_rows(y)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    yf = np.asarray(y, np.float32)
    tol = 0.55 * np.asarray(s) + 0.02 * np.abs(yf)
    assert (np.abs(deq - yf) <= tol).all()
    # shape fallbacks
    assert fq.transpose_quant(jnp.zeros((2, 3, 13, 120), jnp.bfloat16)) is None
