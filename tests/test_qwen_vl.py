"""Qwen2.5-VL parity tests against the HF implementation (random weights).

The reference model is a direct HF Qwen2_5_VLForConditionalGeneration
subclass (qwen_image_text_encoder_withdecode.py:6), so HF is the oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.models import qwen_vl as jvl
from physicedit_tpu.models import qwen_vl_vision as jvis
from physicedit_tpu.io import convert as C

transformers = pytest.importorskip("transformers")


def _tiny_hf(seed=0):
    import torch
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(seed)
    cfg = Qwen2_5_VLConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        rope_scaling={"mrope_section": [4, 2, 2], "rope_type": "default",
                      "type": "default"},
        rope_theta=1e6, tie_word_embeddings=False, rms_norm_eps=1e-6,
        bos_token_id=1, eos_token_id=2,
        image_token_id=99, video_token_id=100,
        vision_start_token_id=98, vision_end_token_id=97,
        vision_config={"depth": 2, "hidden_size": 32, "num_heads": 2,
                       "intermediate_size": 64, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 2,
                       "out_hidden_size": 64, "fullatt_block_indexes": [1],
                       "window_size": 56, "in_channels": 3,
                       "tokens_per_second": 2},
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    jcfg = jvl.QwenVLTextConfig(
        hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        intermediate_size=128, vocab_size=512, mrope_section=(4, 2, 2),
        eos_token_id=2)
    vcfg = jvis.QwenVLVisionConfig(
        depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
        window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64)
    return model, jcfg, vcfg


def test_text_forward_parity():
    import torch

    model, jcfg, _ = _tiny_hf()
    params = C.qwen_vl_text_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, s = 2, 11
    ids = rng.integers(5, 500, size=(b, s))
    mask = np.ones((b, s), np.int64)
    with torch.no_grad():
        out = model.model.language_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
        ref = out.last_hidden_state.numpy()

    pos = np.tile(np.arange(s)[None, None], (3, b, 1))
    emb = jvl.embed_tokens(params, jnp.asarray(ids))
    ours = jvl.text_forward(params, jcfg, emb, jnp.asarray(pos),
                            jnp.asarray(mask, bool))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_text_forward_padding_parity():
    """Right-padded batch must match per-sample unpadded runs."""
    model, jcfg, _ = _tiny_hf(1)
    params = C.qwen_vl_text_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(5, 500, size=(1, 7))
    pad_ids = np.concatenate([ids, np.zeros((1, 3), np.int64)], 1)
    mask = np.concatenate([np.ones((1, 7)), np.zeros((1, 3))], 1)

    pos = np.tile(np.arange(10)[None, None], (3, 1, 1))
    emb = jvl.embed_tokens(params, jnp.asarray(pad_ids))
    padded = jvl.text_forward(params, jcfg, emb, jnp.asarray(pos),
                              jnp.asarray(mask, bool))

    pos7 = np.tile(np.arange(7)[None, None], (3, 1, 1))
    emb7 = jvl.embed_tokens(params, jnp.asarray(ids))
    plain = jvl.text_forward(params, jcfg, emb7, jnp.asarray(pos7),
                             jnp.ones((1, 7), bool))
    np.testing.assert_allclose(np.asarray(padded)[:, :7], np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_vision_parity():
    import torch

    model, _, vcfg = _tiny_hf(2)
    params = C.qwen_vl_vision_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    grid = [(1, 6, 8)]  # 48 patches -> 12 merged tokens
    n = sum(t * h * w for t, h, w in grid)
    patches = rng.normal(size=(n, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.visual(torch.tensor(patches),
                                 grid_thw=torch.tensor(grid)).numpy()
    ours = jvis.run_vision(params, vcfg, jnp.asarray(patches), grid)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_vision_parity_multi_image():
    import torch

    model, _, vcfg = _tiny_hf(3)
    params = C.qwen_vl_vision_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    grid = [(1, 4, 6), (1, 6, 4)]
    n = sum(t * h * w for t, h, w in grid)
    patches = rng.normal(size=(n, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.visual(torch.tensor(patches),
                                 grid_thw=torch.tensor(grid)).numpy()
    ours = jvis.run_vision(params, vcfg, jnp.asarray(patches), grid)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_vision_batched_matches_per_image():
    """run_vision_batched (leading vmap axis, shared geometry) must equal
    B independent run_vision calls — the sweep-serving vision path."""
    model, _, vcfg = _tiny_hf(4)
    params = C.qwen_vl_vision_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    grid_one = (1, 6, 8)
    n = grid_one[0] * grid_one[1] * grid_one[2]
    batch = np.stack([rng.normal(size=(n, 3 * 2 * 14 * 14))
                      for _ in range(3)]).astype(np.float32)
    fb = np.asarray(jvis.run_vision_batched(params, vcfg,
                                            jnp.asarray(batch), grid_one))
    for i in range(3):
        one = np.asarray(jvis.run_vision(params, vcfg,
                                         jnp.asarray(batch[i]), [grid_one]))
        np.testing.assert_allclose(fb[i], one, rtol=1e-5, atol=1e-5)


def test_greedy_decode_matches_hf_generate():
    import torch

    model, jcfg, _ = _tiny_hf(4)
    params = C.qwen_vl_text_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    s = 9
    ids = rng.integers(5, 500, size=(1, s))
    max_new = 8
    with torch.no_grad():
        gen = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.ones(1, s).long(),
            max_new_tokens=max_new, do_sample=False)
    ref_new = gen[0, s:].numpy()

    pos = np.tile(np.arange(s)[None, None], (3, 1, 1))
    emb = jvl.embed_tokens(params, jnp.asarray(ids))
    logits, caches, _ = jvl.prefill(params, jcfg, emb, jnp.asarray(pos),
                                    jnp.ones((1, s), bool), s + max_new)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    toks, done = jvl.greedy_decode(params, jcfg, caches, first, s,
                                   jnp.full((1,), s, jnp.int32), max_new)
    ours = np.asarray(toks)[0]
    # HF stops at EOS; compare the overlapping prefix.
    np.testing.assert_array_equal(ours[: len(ref_new)], ref_new)


def test_multimodal_greedy_decode_matches_hf():
    """The reason_physical path: image tokens in the prompt, then decode."""
    import torch

    model, jcfg, vcfg = _tiny_hf(7)
    tparams = C.qwen_vl_text_from_torch(model.state_dict(), dtype=jnp.float32)
    vparams = C.qwen_vl_vision_from_torch(model.state_dict(), dtype=jnp.float32)

    from physicedit_tpu.pipeline import vl_host

    img_id = model.config.image_token_id
    vstart = model.config.vision_start_token_id
    grids = [(1, 4, 6)]  # 24 patches -> 6 merged tokens
    rng = np.random.default_rng(7)
    patches = rng.normal(size=(24, 3 * 2 * 14 * 14)).astype(np.float32)

    ids = [11, 12, vstart] + [img_id] * 6 + [13, 14, 15]
    ids_np = np.asarray(ids, np.int32)
    max_new = 6

    with torch.no_grad():
        gen = model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids)).long(),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grids),
            max_new_tokens=max_new, do_sample=False)
    ref_new = gen[0, len(ids):].numpy()

    feats = np.asarray(jvis.run_vision(vparams, vcfg, jnp.asarray(patches), grids))
    embeds = np.asarray(jvl.embed_tokens(tparams, jnp.asarray(ids_np)))
    embeds = vl_host.scatter_vision_features(embeds, ids_np, feats, img_id)
    pos = vl_host.get_rope_index(ids_np, grids, img_id, vstart)

    s = len(ids)
    logits, caches, _ = jvl.prefill(tparams, jcfg, jnp.asarray(embeds[None]),
                                    jnp.asarray(pos[:, None, :]),
                                    jnp.ones((1, s), bool), s + max_new)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    start_rope = int(pos.max()) + 1
    toks, _ = jvl.greedy_decode(tparams, jcfg, caches, first, s,
                                jnp.full((1,), start_rope, jnp.int32), max_new)
    ours = np.asarray(toks)[0]
    np.testing.assert_array_equal(ours[: len(ref_new)], ref_new)


def test_left_padded_decode_matches_unpadded():
    """Bucketed (left-padded + masked) prefill/decode must produce the same
    tokens as the unpadded run — the reasoner's compile-reuse path."""
    model, jcfg, _ = _tiny_hf(9)
    params = C.qwen_vl_text_from_torch(model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(9)
    s, max_new = 9, 6
    ids = rng.integers(5, 500, size=(1, s))
    pos = np.tile(np.arange(s)[None, None], (3, 1, 1))
    emb = np.asarray(jvl.embed_tokens(params, jnp.asarray(ids)))

    # unpadded
    logits, caches, _ = jvl.prefill(params, jcfg, jnp.asarray(emb),
                                    jnp.asarray(pos), jnp.ones((1, s), bool),
                                    s + max_new)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    ref, _ = jvl.greedy_decode(params, jcfg, caches, first, s,
                               jnp.full((1,), s, jnp.int32), max_new)

    # left-padded to 16
    pad = 16 - s
    emb_p = np.concatenate([np.zeros((1, pad, emb.shape[-1]), emb.dtype), emb], 1)
    pos_p = np.concatenate([np.zeros((3, 1, pad), pos.dtype), pos], 2)
    mask = np.concatenate([np.zeros((1, pad), bool), np.ones((1, s), bool)], 1)
    max_total = 16 + max_new
    logits2, caches2, _ = jvl.prefill(params, jcfg, jnp.asarray(emb_p),
                                      jnp.asarray(pos_p), jnp.asarray(mask),
                                      max_total)
    first2 = jnp.argmax(logits2, -1).astype(jnp.int32)
    key_mask = jnp.asarray(np.concatenate(
        [mask, np.zeros((1, max_total - 16), bool)], 1))
    out, _ = jvl.greedy_decode(params, jcfg, caches2, first2, 16,
                               jnp.full((1,), s, jnp.int32), max_new,
                               key_mask=key_mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_fused_decode_projections_exact():
    """fuse_decode_projections concatenates per-output-channel weights, so
    float and packed-int4 trees must produce identical forwards."""
    import jax
    import numpy as np
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
    from physicedit_tpu.models import qwen_vl as m

    cfg = m.TINY_TEXT
    params = m.init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 8, cfg.hidden_size)) * 0.3,
                      jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8)[None, None], (3, 1, 8))
    mask = jnp.ones((1, 8), bool)

    base = m.text_forward(params, cfg, emb, pos, mask)
    fused = m.text_forward(m.fuse_decode_projections(params), cfg, emb, pos,
                           mask)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-6, atol=1e-6)

    q = quantize_tree_int4(params, min_size=1)
    base_q = m.text_forward(q, cfg, emb, pos, mask)
    fused_q = m.text_forward(m.fuse_decode_projections(q), cfg, emb, pos,
                             mask)
    np.testing.assert_allclose(np.asarray(fused_q), np.asarray(base_q),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_int8_kv_cache_decode_matches_float():
    """kv_int8 prefill + decode: int8 per-(pos, head) cache entries track
    the float-cache decode (same tokens on a seeded tiny model; cache
    dequantization error bounded)."""
    import jax.numpy as jnp

    cfg = jvl.QwenVLTextConfig(
        hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=256, eos_token_id=-1)
    params = jvl.init_text_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    rng = np.random.default_rng(21)
    b, s, n_new = 2, 24, 12
    emb = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.3,
                      jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, b, s))
    mask = jnp.ones((b, s), bool)

    lf, cf, _ = jvl.prefill(params, cfg, emb, pos, mask, s + n_new)
    lq, cq, _ = jvl.prefill(params, cfg, emb, pos, mask, s + n_new,
                            kv_int8=True)
    assert len(cq) == 4 and cq[0].dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lq), rtol=1e-5,
                               atol=1e-5)  # prefill logits ignore the cache
    # cache dequantization error small
    deq = np.asarray(cq[0], np.float32) * np.asarray(cq[1], np.float32)[..., None]
    np.testing.assert_allclose(deq, np.asarray(cf[0], np.float32),
                               atol=2e-2, rtol=2e-1)

    first = jnp.argmax(lf, -1).astype(jnp.int32)
    start_rope = jnp.full((b,), s, jnp.int32)
    tf, _ = jvl.greedy_decode(params, cfg, cf, first, s, start_rope, n_new)
    tq, _ = jvl.greedy_decode(params, cfg, cq, first, s, start_rope, n_new)
    assert np.array_equal(np.asarray(tf), np.asarray(tq)), (
        f"int8-KV decode diverged: {np.asarray(tf)} vs {np.asarray(tq)}")


@pytest.mark.slow
def test_split_layers_matches_stacked():
    """split_layers (per-layer weight trees, unrolled layer loop — the
    serving decode layout that avoids the scan-xs slice materialisation in
    front of the Pallas GEMVs) is bitwise-equivalent to the stacked scan
    across text_forward, prefill and greedy_decode (incl. int8 KV)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = jvl.QwenVLTextConfig(
        hidden_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=256, eos_token_id=-1)
    params = jvl.init_text_params(jax.random.PRNGKey(11), cfg, jnp.float32)
    split = jvl.split_layers(params)
    assert isinstance(split["layers"], tuple) and len(split["layers"]) == 3
    assert jvl.split_layers(split) is split or isinstance(
        jvl.split_layers(split)["layers"], tuple)   # idempotent

    rng = np.random.default_rng(3)
    b, s, n_new = 2, 16, 8
    emb = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.3,
                      jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, b, s))
    mask = jnp.ones((b, s), bool)

    h0 = jvl.text_forward(params, cfg, emb, pos, mask)
    h1 = jvl.text_forward(split, cfg, emb, pos, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=1e-6, atol=1e-6)

    for kv_int8 in (False, True):
        l0, c0, _ = jvl.prefill(params, cfg, emb, pos, mask, s + n_new,
                                kv_int8=kv_int8)
        l1, c1, _ = jvl.prefill(split, cfg, emb, pos, mask, s + n_new,
                                kv_int8=kv_int8)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=1e-5)
        for a, c in zip(c1, c0):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(c, np.float32),
                                       rtol=1e-5, atol=1e-5)

        first = jnp.argmax(l0, -1).astype(jnp.int32)
        start_rope = jnp.full((b,), s, jnp.int32)
        t0, d0 = jvl.greedy_decode(params, cfg, c0, first, s, start_rope,
                                   n_new)
        t1, d1 = jvl.greedy_decode(split, cfg, c1, first, s, start_rope,
                                   n_new)
        assert np.array_equal(np.asarray(t0), np.asarray(t1)), kv_int8
        assert np.array_equal(np.asarray(d0), np.asarray(d1))
