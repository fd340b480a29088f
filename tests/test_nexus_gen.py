"""Nexus-Gen (legacy zoo M7) parity tests vs the reference torch modules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import load_ref_module, requires_reference


def _torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


# ---------------------------------------------------------------------------
# Projector: adapter
# ---------------------------------------------------------------------------

@requires_reference
def test_nexus_adapter_parity():
    torch = _torch()
    ref = load_ref_module("models.nexus_gen_projector")
    net = ref.NexusGenAdapter(input_dim=16, output_dim=24).eval()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.2)

    from physicedit_tpu.models.nexus_gen_projector import (adapter_forward,
                                                           adapter_from_torch)

    params = adapter_from_torch(net.state_dict())
    x = np.random.default_rng(0).normal(size=(3, 7, 16)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = adapter_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Projector: embedding merger (full 7B-width config, 1 layer, CPU fp32)
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.slow
def test_nexus_merger_parity():
    torch = _torch()
    ref = load_ref_module("models.nexus_gen_projector")
    net = ref.NexusGenImageEmbeddingMerger(num_layers=1, out_channel=64,
                                           expand_ratio=2, device="cpu").eval()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.02)

    from physicedit_tpu.models.nexus_gen_projector import (merger_forward,
                                                           merger_from_torch)

    params = merger_from_torch(net.state_dict())
    rng = np.random.default_rng(1)
    grid = (1, 36, 36)                  # 18x18 = 324 embedding tokens
    n_tok = (grid[1] // 2) * (grid[2] // 2)
    embeds = rng.normal(size=(1, n_tok, 3584)).astype(np.float32) * 0.1

    with torch.no_grad():
        want = net(torch.from_numpy(embeds),
                   torch.tensor([list(grid)])).numpy()
    got = merger_forward(params, jnp.asarray(embeds), grid)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=5e-3)


@requires_reference
@pytest.mark.slow
def test_nexus_merger_with_reference_embeds():
    torch = _torch()
    ref = load_ref_module("models.nexus_gen_projector")
    net = ref.NexusGenImageEmbeddingMerger(num_layers=1, out_channel=32,
                                           expand_ratio=2, device="cpu").eval()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.02)

    from physicedit_tpu.models.nexus_gen_projector import (merger_forward,
                                                           merger_from_torch)

    params = merger_from_torch(net.state_dict())
    rng = np.random.default_rng(2)
    grid, ref_grid = (1, 12, 12), (1, 16, 16)
    e = rng.normal(size=(1, 36, 3584)).astype(np.float32) * 0.1
    r = rng.normal(size=(1, 64, 3584)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = net(torch.from_numpy(e), torch.tensor([list(grid)]),
                   torch.from_numpy(r), torch.tensor([list(ref_grid)])).numpy()
    got = merger_forward(params, jnp.asarray(e), grid, jnp.asarray(r), ref_grid)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=5e-3)


# ---------------------------------------------------------------------------
# AR model: scatter + dual heads vs a torch reproduction of the reference
# semantics (nexus_gen.py:116-152) on a tiny config
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_nexus_forward_and_target_embeddings():
    from physicedit_tpu.models import nexus_gen as NG
    from physicedit_tpu.models import qwen_vl as VL

    cfg = VL.QwenVLTextConfig(num_layers=2, hidden_size=64, num_heads=4,
                              num_kv_heads=2, head_dim=16,
                              intermediate_size=96, vocab_size=151700,
                              mrope_section=(2, 3, 3), rope_theta=1e4)
    params = NG.init_nexus_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    # prompt: text(3) + input image(4 tokens, grid (1,4,4)) + text(2)
    # + target image (81 -> use 4 here via patched constant? keep 81 real)
    n_in = 4
    ids = ([5, NG.VISION_START_ID] + [NG.IMAGE_TOKEN_ID] * n_in
           + [NG.VISION_END_ID, 7, NG.VISION_START_ID]
           + [NG.IMAGE_TOKEN_ID] * NG.NUM_IMG_TOKENS
           + [NG.VISION_END_ID, 9])
    ids = np.asarray([ids], np.int32)
    rng = np.random.default_rng(3)
    vis = rng.normal(size=(n_in, 64)).astype(np.float32) * 0.1
    grids = [(1, 4, 4), (1, 18, 18)]

    out = NG.target_embeddings(params, cfg, ids, vis, grids)
    assert out.shape == (NG.NUM_IMG_TOKENS, 64)
    assert np.isfinite(np.asarray(out)).all()

    # the scatter must place vis embeds then prefill embeds at image slots:
    # verify by reproducing the embedding table gather in numpy
    table = np.concatenate([vis, np.asarray(params["image_prefill_embeds"])])
    emb = np.asarray(params["text"]["embed"])[ids[0]]
    mask = ids[0] == NG.IMAGE_TOKEN_ID
    emb[mask] = table
    from physicedit_tpu.pipeline.vl_host import get_rope_index

    pos = jnp.asarray(get_rope_index(ids[0], grids, NG.IMAGE_TOKEN_ID,
                                     NG.VISION_START_ID))[:, None, :]
    hidden = VL.text_forward(params["text"], cfg, jnp.asarray(emb[None]),
                             pos, jnp.ones(ids.shape, bool))
    from physicedit_tpu.core.params import linear

    img_embeds = np.asarray(linear(params["vision_head"], hidden))
    img_pos = np.nonzero(mask)[0][-NG.NUM_IMG_TOKENS:]
    np.testing.assert_allclose(np.asarray(out), img_embeds[0, img_pos - 1],
                               atol=1e-5)


def test_nexus_target_embeddings_t2i_no_reference_image():
    """T2I path: no reference image -> empty input embeds (regression for
    the reshape(0, -1) crash)."""
    from physicedit_tpu.models import nexus_gen as NG
    from physicedit_tpu.models import qwen_vl as VL

    cfg = VL.QwenVLTextConfig(num_layers=1, hidden_size=32, num_heads=2,
                              num_kv_heads=1, head_dim=16,
                              intermediate_size=48, vocab_size=151700,
                              mrope_section=(2, 3, 3), rope_theta=1e4)
    params = NG.init_nexus_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    ids = np.asarray([[5, NG.VISION_START_ID]
                      + [NG.IMAGE_TOKEN_ID] * NG.NUM_IMG_TOKENS
                      + [NG.VISION_END_ID, 9]], np.int32)
    out = NG.target_embeddings(params, cfg, ids, np.zeros((0,), np.float32),
                               [(1, 18, 18)])
    assert out.shape == (NG.NUM_IMG_TOKENS, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_nexus_messages():
    from physicedit_tpu.models import nexus_gen as NG

    m = NG.editing_messages("make it red")
    assert m[0]["content"].startswith("<image>")
    assert "<image>" in m[1]["content"]
    g = NG.generation_messages("a cat")
    assert "description: a cat" in g[0]["content"]


def test_nexus_llm_converter_roundtrip():
    """Converter accepts the raw checkpoint key layout (model.layers.*,
    vision_head.*, image_prefill_embeds.*) and produces the right tree."""
    rng = np.random.default_rng(4)
    d, inter, vocab = 16, 24, 40

    def lin(o, i, bias=True):
        out = {"weight": rng.normal(size=(o, i)).astype(np.float32)}
        if bias:
            out["bias"] = rng.normal(size=(o,)).astype(np.float32)
        return out

    sd = {}
    for li in range(2):
        p = f"model.layers.{li}"
        sd[f"{p}.input_layernorm.weight"] = np.ones((d,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((d,), np.float32)
        for name, (o, i, b) in {
            "self_attn.q_proj": (d, d, True), "self_attn.k_proj": (8, d, True),
            "self_attn.v_proj": (8, d, True), "self_attn.o_proj": (d, d, False),
            "mlp.gate_proj": (inter, d, False), "mlp.up_proj": (inter, d, False),
            "mlp.down_proj": (d, inter, False),
        }.items():
            for kk, vv in lin(o, i, b).items():
                sd[f"{p}.{name}.{kk}"] = vv
    sd["model.embed_tokens.weight"] = rng.normal(size=(vocab, d)).astype(np.float32)
    sd["model.norm.weight"] = np.ones((d,), np.float32)
    sd["lm_head.weight"] = rng.normal(size=(vocab, d)).astype(np.float32)
    sd["vision_head.weight"] = rng.normal(size=(d, d)).astype(np.float32)
    sd["image_prefill_embeds.weight"] = rng.normal(size=(81, d)).astype(np.float32)

    from physicedit_tpu.models.nexus_gen import nexus_llm_from_torch

    p = nexus_llm_from_torch(sd, jnp.float32)
    assert p["text"]["embed"].shape == (vocab, d)
    assert p["vision_head"]["w"].shape == (d, d)
    assert p["image_prefill_embeds"].shape == (81, d)
    np.testing.assert_allclose(np.asarray(p["vision_head"]["w"]),
                               sd["vision_head.weight"].T)
