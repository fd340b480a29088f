"""Pallas flash-attention kernel vs the XLA reference (interpreter mode)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from physicedit_tpu.kernels import flash_attention as fa
from physicedit_tpu.ops.attention import sdpa_xla


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode on CPU."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _rand(b, s, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32)))


def test_flash_matches_xla_unmasked():
    q, k, v = _rand(1, 384, 2, 128)
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_matches_xla_masked_and_ragged():
    # S=300 is not a block multiple -> exercises padding; mask padded keys.
    q, k, v = _rand(2, 300, 2, 128, seed=1)
    mask = np.ones((2, 300), bool)
    mask[0, 250:] = False
    mask[1, 100:140] = False
    out = fa.flash_attention(q, k, v, key_mask=jnp.asarray(mask),
                             block_q=128, block_k=128)
    ref = sdpa_xla(q, k, v, key_mask=jnp.asarray(mask))
    # Only rows that are valid keys... all query rows are compared; padded
    # SEQUENCE positions beyond 300 never exist here.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_fallback_small_head_dim():
    q, k, v = _rand(1, 64, 2, 32, seed=2)
    out = fa.flash_attention(q, k, v)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fixedmax_matches_xla_masked():
    """Default (fixed-max) variant: masked keys + non-block-multiple length."""
    q, k, v = _rand(2, 300, 2, 128, seed=3)
    mask = np.ones((2, 300), bool)
    mask[0, 250:] = False
    mask[1, 100:140] = False
    out = fa.flash_attention_bnsd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), key_mask=jnp.asarray(mask),
        block_q=128, block_k=128, variant="fixedmax")
    ref = sdpa_xla(q, k, v, key_mask=jnp.asarray(mask)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fixedmax_with_entity_bias():
    """Fixed-max with the EliGen head-shared additive [B,S,S] bias."""
    q, k, v = _rand(1, 256, 2, 128, seed=4)
    bias = np.zeros((1, 256, 256), np.float32)
    bias[0, :64, 128:] = -1e30  # entity block mask
    out = fa.flash_attention_bnsd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias=jnp.asarray(bias),
        block_q=128, block_k=128, variant="fixedmax")
    ref = sdpa_xla(q, k, v, bias=jnp.asarray(bias)[:, None]).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fixedmax_clamp_guards_large_logits():
    """Logits beyond CLAMP stay finite (overflow guard for extreme gammas)."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(30.0 * rng.normal(size=(1, 2, 128, 128)).astype(np.float32))
    out = fa.flash_attention_bnsd(q, q, q, block_q=128, block_k=128,
                                  variant="fixedmax")
    assert np.isfinite(np.asarray(out)).all()


def test_fixedmax_gradients_match_xla():
    """Custom-VJP backward kernels vs XLA autodiff through sdpa."""
    rng = np.random.default_rng(7)
    b, n, s, d = 1, 2, 256, 128
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 200:] = False
    mask_j = jnp.asarray(mask)
    gsum = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))

    def loss_flash(q, k, v):
        o = fa.flash_attention_bnsd(q, k, v, key_mask=mask_j,
                                    block_q=128, block_k=128,
                                    variant="fixedmax")
        return jnp.sum(o * gsum)

    from physicedit_tpu.ops.attention import sdpa_bnsd

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_bnsd(q, k, v, key_mask=mask_j) * gsum)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_fixedmax_gradients_ragged_padding():
    """Gradients through the padded (non-block-multiple) wrapper path:
    padded key/query tail must receive zero gradient contributions."""
    rng = np.random.default_rng(8)
    b, n, s, d = 1, 1, 200, 128  # pads to 256
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))

    def loss(q, k, v):
        o = fa.flash_attention_bnsd(q, k, v, block_q=128, block_k=128,
                                    variant="fixedmax")
        return jnp.sum(o ** 2)

    from physicedit_tpu.ops.attention import sdpa_bnsd

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_bnsd(q, k, v) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fixedmax_fully_masked_row_is_finite_zero():
    """A row whose keys are ALL masked returns zeros (documented invariant:
    finite, discarded by the caller) instead of 0/0 NaN."""
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(1, 1, 128, 128)).astype(np.float32))
    mask = jnp.zeros((1, 128), bool)
    out = fa.flash_attention_bnsd(q, q, q, key_mask=mask,
                                  block_q=128, block_k=128,
                                  variant="fixedmax")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


# ---------------------------------------------------------------------------
# GQA causal flash (Qwen2.5-VL prefill kernel)
# ---------------------------------------------------------------------------

def _gqa_dense_ref(q, k, v, key_mask):
    """Dense causal GQA reference (the round-2 XLA path)."""
    from physicedit_tpu.models.qwen_vl import _gqa_attention

    b, s = q.shape[0], q.shape[1]
    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    ok = (k_pos <= q_pos)[None] & key_mask[:, None, :]
    bias = jnp.where(ok, 0.0, -1e30)[:, None].astype(jnp.float32)
    return _gqa_attention(q, k, v, bias)


def test_gqa_causal_flash_matches_dense():
    """28 Q / 4 KV heads grouped via the BlockSpec index map; full mask."""
    rng = np.random.default_rng(5)
    b, s, n, kv, d = 1, 384, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    mask = jnp.ones((b, s), bool)
    out = fa.gqa_causal_flash(q, k, v, mask, block_q=128, block_k=128)
    ref = _gqa_dense_ref(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_gqa_causal_flash_left_padded_batch():
    """The batched-reasoner layout: rows left-padded to a shared bucket;
    ragged S exercises tail padding; padded query rows are discardable."""
    rng = np.random.default_rng(6)
    b, s, n, kv, d = 2, 300, 4, 4, 128
    q = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, :77] = False   # row 0 left-padded by 77
    mask[1, :5] = False
    mask_j = jnp.asarray(mask)
    out = np.asarray(fa.gqa_causal_flash(q, k, v, mask_j,
                                         block_q=128, block_k=128))
    ref = np.asarray(_gqa_dense_ref(q, k, v, mask_j))
    for i in range(b):
        live = mask[i]
        np.testing.assert_allclose(out[i][live], ref[i][live],
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_vl_prefill_routes_to_flash_and_matches(monkeypatch):
    """models/qwen_vl.prefill with the flash path forced on (interpret mode)
    == the dense path, including the downstream greedy decode handoff."""
    import physicedit_tpu.models.qwen_vl as m

    cfg = m.QwenVLTextConfig(
        hidden_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=128, intermediate_size=256, vocab_size=128)
    params = m.init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    b, s = 2, 256
    emb = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    pids = jnp.broadcast_to(jnp.arange(s)[None, None], (3, b, s))
    mask = np.ones((b, s), bool)
    mask[0, :31] = False
    mask_j = jnp.asarray(mask)

    # platform is cpu here, so _prefill_attention's TPU gate would skip the
    # kernel — force the route and rely on interpret mode
    monkeypatch.setattr(m, "_VL_FLASH", True)
    monkeypatch.setattr(jax, "devices",
                        lambda *a: [type("D", (), {"platform": "tpu"})()])
    logits_f, caches_f, hid_f = m.prefill(params, cfg, emb, pids, mask_j,
                                          max_total_len=s + 8)

    monkeypatch.setattr(m, "_VL_FLASH", False)
    logits_d, caches_d, hid_d = m.prefill(params, cfg, emb, pids, mask_j,
                                          max_total_len=s + 8)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_d),
                               rtol=2e-3, atol=2e-3)
    for cf, cd in zip(jax.tree_util.tree_leaves(caches_f),
                      jax.tree_util.tree_leaves(caches_d)):
        np.testing.assert_allclose(np.asarray(cf), np.asarray(cd),
                                   rtol=2e-3, atol=2e-3)


def test_flash_sq_ne_sk():
    """Query subset against full K/V (the slim last DiT block)."""
    rng = np.random.default_rng(11)
    b, n, sk, sq, d = 1, 2, 384, 128, 128
    q = jnp.asarray(rng.normal(size=(b, n, sq, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(b, n, sk, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(b, n, sk, d)).astype(np.float32))
    mask = np.ones((b, sk), bool)
    mask[0, 300:] = False
    mask_j = jnp.asarray(mask)
    from physicedit_tpu.ops.attention import sdpa_bnsd

    out = fa.flash_attention_bnsd(q, k, v, key_mask=mask_j,
                                  block_q=128, block_k=128)
    ref = sdpa_bnsd(q, k, v, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fixedmax_noclamp_matches_clamp_on_bounded_inputs():
    """With RMS-normed q/k the CLAMP is mathematically inert; the no-clamp
    kernel (one fewer VPU op in the hot loop) must agree exactly."""
    rng = np.random.default_rng(12)
    b, n, s, d = 1, 2, 256, 128
    q = rng.normal(size=(b, n, s, d)).astype(np.float32)
    k = rng.normal(size=(b, n, s, d)).astype(np.float32)
    # rms-normalise per head row (the DiT does this before attention)
    q /= np.sqrt((q ** 2).mean(-1, keepdims=True))
    k /= np.sqrt((k ** 2).mean(-1, keepdims=True))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    q, k = jnp.asarray(q), jnp.asarray(k)
    mask = np.ones((b, s), bool)
    mask[0, 200:] = False
    mask_j = jnp.asarray(mask)
    a = fa.flash_attention_bnsd(q, k, v, key_mask=mask_j,
                                block_q=128, block_k=128, clamp=True)
    bnc = fa.flash_attention_bnsd(q, k, v, key_mask=mask_j,
                                  block_q=128, block_k=128, clamp=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bnc),
                               rtol=0, atol=0)


def test_fixedmax_noclamp_backward_matches():
    def run(clamp):
        rng = np.random.default_rng(13)
        b, n, s, d = 1, 1, 128, 128
        q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))

        def loss(q, k, v):
            out = fa.flash_attention_bnsd(q, k, v, block_q=128, block_k=128,
                                          clamp=clamp)
            return jnp.sum(out ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for g1, g2 in zip(run(True), run(False)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)


def test_attn_clamp_needed_gamma_bound():
    import jax.numpy as jnp

    from physicedit_tpu.models import dit as jdit

    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    params = jdit.init_dit_params(jax.random.PRNGKey(0), cfg)
    assert jdit.attn_clamp_needed(params) is False  # unit gammas: safe
    params["blocks"]["attn"]["norm_q"]["scale"] = (
        params["blocks"]["attn"]["norm_q"]["scale"] * 100.0)
    assert jdit.attn_clamp_needed(params) is True   # pathological gammas
