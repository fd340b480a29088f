"""Ring attention over an 8-device mesh vs single-device full attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.parallel import ring_attention as ra
from physicedit_tpu.parallel import sharding as sh
from physicedit_tpu.ops.attention import sdpa_bnsd


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_matches_full():
    mesh = sh.create_mesh(1, 8)
    rng = np.random.default_rng(0)
    b, n, s, d = 1, 2, 8 * 64, 64
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 500:] = False  # padded tail spanning the last shard
    mask_j = jnp.asarray(mask)

    out = ra.ring_attention(q, k, v, mask_j, mesh, axis=sh.MODEL_AXIS)
    ref = sdpa_bnsd(q, k, v, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out)[:, :, mask[0]],
                               np.asarray(ref)[:, :, mask[0]],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_sharded_inputs():
    """Inputs physically sharded on the sequence axis stay sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sh.create_mesh(1, 8)
    rng = np.random.default_rng(1)
    b, n, s, d = 1, 2, 8 * 32, 32
    sharding = NamedSharding(mesh, P(None, None, sh.MODEL_AXIS, None))
    q = jax.device_put(jnp.asarray(rng.normal(size=(b, n, s, d)), jnp.float32), sharding)
    k = jax.device_put(jnp.asarray(rng.normal(size=(b, n, s, d)), jnp.float32), sharding)
    v = jax.device_put(jnp.asarray(rng.normal(size=(b, n, s, d)), jnp.float32), sharding)
    mask = jax.device_put(jnp.ones((b, s), bool),
                          NamedSharding(mesh, P(None, sh.MODEL_AXIS)))
    out = ra.ring_attention(q, k, v, mask, mesh, axis=sh.MODEL_AXIS)
    ref = sdpa_bnsd(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dit_forward_ring_matches_xla():
    import jax.numpy as jnp

    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    mesh = sh.create_mesh(1, 8)
    jdit.set_ring_context(mesh, sh.MODEL_AXIS)
    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    params = jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    s_i, s_t = 32, 8  # joint 40 -> padded to 40/8 per shard
    img = jnp.asarray(rng.normal(size=(1, s_i, 64)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, s_t, 48)).astype(np.float32))
    t = jnp.asarray([0.5])
    ropes = list(map(jnp.asarray, jrope.build_rope_tables(
        [(1, 4, 8)], s_t, axes_dim=(8, 12, 12))))
    mask = jnp.ones((1, s_t), bool)

    ref = jdit.dit_forward(params, cfg, img, txt, t, *ropes, txt_key_mask=mask)
    out = jdit.dit_forward(params, cfg, img, txt, t, *ropes, txt_key_mask=mask,
                           attn_impl="ring")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_entity_bias_matches_full():
    """EliGen entity bias rides the ring (VERDICT r2: the ring branch used
    to silently drop it): block-structured additive bias under ring ==
    dense-with-bias."""
    mesh = sh.create_mesh(1, 8)
    rng = np.random.default_rng(3)
    b, n, s, d = 2, 2, 8 * 32, 32
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 230:] = False
    # entity-style block bias: some (query, key) pairs masked out
    bias = np.zeros((b, s, s), np.float32)
    bias[0, 10:40, 60:90] = -1e30
    bias[1, :16, 128:] = -1e30
    mask_j, bias_j = jnp.asarray(mask), jnp.asarray(bias)

    out = ra.ring_attention(q, k, v, mask_j, mesh, axis=sh.MODEL_AXIS,
                            bias=bias_j)
    ref = sdpa_bnsd(q, k, v, key_mask=mask_j, bias=bias_j[:, None])
    np.testing.assert_allclose(np.asarray(out)[:, :, mask[0]],
                               np.asarray(ref)[:, :, mask[0]],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dit_forward_ring_entity_bias_matches_xla():
    """Entity-masked DiT output under sequence parallelism == dense."""
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope

    mesh = sh.create_mesh(1, 8)
    jdit.set_ring_context(mesh, sh.MODEL_AXIS)
    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    params = jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(4)
    s_i, s_t = 32, 8
    img = jnp.asarray(rng.normal(size=(1, s_i, 64)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, s_t, 48)).astype(np.float32))
    t = jnp.asarray([0.5])
    ropes = list(map(jnp.asarray, jrope.build_rope_tables(
        [(1, 4, 8)], s_t, axes_dim=(8, 12, 12))))
    mask = jnp.ones((1, s_t), bool)
    bias = np.zeros((1, s_t + s_i, s_t + s_i), np.float32)
    bias[0, :4, s_t + 16:] = -1e30  # entity segment sees half the image
    bias = jnp.asarray(bias)

    ref = jdit.dit_forward(params, cfg, img, txt, t, *ropes,
                           txt_key_mask=mask, attn_bias=bias)
    out = jdit.dit_forward(params, cfg, img, txt, t, *ropes,
                           txt_key_mask=mask, attn_impl="ring",
                           attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    # and the bias actually changes the output (not a silent no-op)
    base = jdit.dit_forward(params, cfg, img, txt, t, *ropes,
                            txt_key_mask=mask, attn_impl="ring")
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ulysses_attention_matches_full():
    rng = np.random.default_rng(2)
    b, n, s, d = 1, 8, 8 * 16, 32  # heads == devices
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 100:] = False
    mesh = sh.create_mesh(1, 8)
    out = ra.ulysses_attention(q, k, v, jnp.asarray(mask), mesh,
                               axis=sh.MODEL_AXIS)
    ref = sdpa_bnsd(q, k, v, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out)[:, :, mask[0]],
                               np.asarray(ref)[:, :, mask[0]],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_pallas_chunks_match_full(monkeypatch):
    """The fused fixed-max Pallas per-chunk lane (interpret mode on CPU):
    unnormalised partials added across ring hops == monolithic attention."""
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))

    mesh = sh.create_mesh(1, 8)
    rng = np.random.default_rng(2)
    b, n, s, d = 1, 2, 8 * 128, 128       # head_dim 128 = the kernel's tile
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 900:] = False                 # tail spanning the last shard
    mask_j = jnp.asarray(mask)

    out = ra.ring_attention(q, k, v, mask_j, mesh, axis=sh.MODEL_AXIS,
                            impl="pallas")
    ref = sdpa_bnsd(q, k, v, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out)[:, :, mask[0]],
                               np.asarray(ref)[:, :, mask[0]],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_pallas_grad_matches_xla(monkeypatch):
    """The fixed-max Pallas ring lane is differentiable: its custom VJP
    (second ring pass, dk/dv partials rotating with their chunk) must
    match autodiff through the dense full-attention reference — SP
    TRAINING stays on the fused kernel instead of the dense chunk."""
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))

    mesh = sh.create_mesh(1, 8)
    rng = np.random.default_rng(5)
    b, n, s, d = 1, 2, 8 * 128, 128       # head_dim 128 = the kernel's tile
    q = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, 900:] = False                 # tail spanning the last shard
    mask_j = jnp.asarray(mask)
    cot = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    cot = cot * mask_j[:, None, :, None]  # no cotangent on masked rows

    def loss_ring(q_, k_, v_):
        out = ra.ring_attention(q_, k_, v_, mask_j, mesh,
                                axis=sh.MODEL_AXIS, impl="pallas")
        return jnp.sum(out * cot)

    def loss_ref(q_, k_, v_):
        return jnp.sum(sdpa_bnsd(q_, k_, v_, key_mask=mask_j) * cot)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name} mismatch")
