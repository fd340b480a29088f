"""Prompt-refiner lane: HF parity oracles + wiring tests.

Parity targets (torch CPU oracles, same pattern as tests/test_qwen_vl.py):
  - models/bloom.py vs transformers BloomForCausalLM (tiny random config)
  - models/marian.py vs transformers MarianMTModel (tiny random config)
  - sampling warpers vs HF LogitsProcessor implementations
Wiring targets (stub tokenizers, no checkpoints):
  - BeautifulPrompt / QwenPrompt / Translator __call__ semantics mirror
    diffsynth/prompters/prompt_refiners.py:36-45,96-115,125-130
  - QwenPrompt does NOT duplicate the first generated token (greedy_decode
    already emits it at output position 0 — ADVICE r3 high finding)
  - make_prompt_refiner CLI factory dispatch
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from physicedit_tpu.models import bloom, marian  # noqa: E402


# ---------------------------------------------------------------------------
# BLOOM
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bloom_pair():
    from transformers import BloomConfig as HFBloomConfig
    from transformers import BloomForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFBloomConfig(vocab_size=97, hidden_size=32, n_layer=2,
                           n_head=4, bos_token_id=1, eos_token_id=2,
                           pad_token_id=3)
    hf = BloomForCausalLM(hf_cfg).eval()
    cfg = bloom.config_from_hf(hf_cfg)
    params = bloom.bloom_from_torch(
        {k: v for k, v in hf.state_dict().items()}, cfg, jnp.float32)
    return hf, cfg, params


def test_bloom_logits_parity_batched_left_pad(bloom_pair):
    """Teacher-forced logits vs HF with DIFFERENT per-row pad lengths —
    exercises the per-batch mask-aware ALiBi positions (r3 ADVICE low:
    the old bias used only mask row 0)."""
    hf, cfg, params = bloom_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    ids[0, :5] = cfg.pad_token_id
    mask[0, :5] = 0          # row 0: 5 pad slots; row 1: none
    ids[1, :2] = cfg.pad_token_id
    mask[1, :2] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(bloom.bloom_logits(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_bloom_greedy_generate_parity(bloom_pair):
    """Greedy continuation vs a manual HF argmax loop (no sampling)."""
    hf, cfg, params = bloom_pair
    rng = np.random.default_rng(1)
    n_new = 6
    ids = rng.integers(4, cfg.vocab_size, size=(1, 8))
    ids[0, :3] = cfg.pad_token_id
    mask = np.ones((1, 8), np.int64)
    mask[0, :3] = 0

    cur_ids, cur_mask = torch.tensor(ids), torch.tensor(mask)
    ref_toks = []
    with torch.no_grad():
        for _ in range(n_new):
            nxt = hf(input_ids=cur_ids, attention_mask=cur_mask
                     ).logits[:, -1].argmax(-1)
            ref_toks.append(int(nxt))
            cur_ids = torch.cat([cur_ids, nxt[:, None]], 1)
            cur_mask = torch.cat([cur_mask, torch.ones((1, 1)).long()], 1)

    got = bloom.bloom_generate(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask), max_new_tokens=n_new,
                               do_sample=False)
    assert np.asarray(got)[0].tolist() == ref_toks


def test_bloom_rep_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 50)).astype(np.float32)
    ids = np.array([[3, 7, 7, 11]])
    proc = RepetitionPenaltyLogitsProcessor(penalty=1.1)
    ref = proc(torch.tensor(ids), torch.tensor(logits.copy())).numpy()
    counts = np.zeros((1, 50), np.int32)
    np.add.at(counts[0], ids[0], 1)
    got = np.asarray(bloom._apply_rep_penalty(
        jnp.asarray(logits), jnp.asarray(counts), 1.1))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_bloom_top_k_top_p_matches_hf():
    from transformers import TopKLogitsWarper, TopPLogitsWarper

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 64)).astype(np.float32) * 3
    ref = TopKLogitsWarper(top_k=10)(None, torch.tensor(logits.copy()))
    ref = TopPLogitsWarper(top_p=0.9)(None, ref).numpy()
    got = np.asarray(bloom._top_k_top_p(jnp.asarray(logits), 10, 0.9))
    # same keep-set; kept logits identical
    keep_ref, keep_got = np.isfinite(ref) & (ref > -1e8), got > -1e8
    assert (keep_ref == keep_got).all()
    np.testing.assert_allclose(got[keep_got], ref[keep_ref], rtol=1e-6)


def test_bloom_alibi_slopes_non_power_of_two():
    """HF build_alibi_tensor handles non-pow2 head counts with an extra
    interleaved slope series; pin a 6-head case against HF."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    mask = torch.ones(1, 4)
    ref = build_alibi_tensor(mask, 6, torch.float32)  # [6, 1, 4]
    slopes = bloom.alibi_slopes(6)
    np.testing.assert_allclose(
        slopes, ref[:, 0, -1].numpy() / 3.0, rtol=1e-6)  # pos 3 * slope


# ---------------------------------------------------------------------------
# Marian
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def marian_pair():
    from transformers import MarianConfig as HFMarianConfig
    from transformers import MarianMTModel

    torch.manual_seed(0)
    hf_cfg = HFMarianConfig(
        vocab_size=73, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, scale_embedding=True,
        activation_function="swish", pad_token_id=72, eos_token_id=0,
        decoder_start_token_id=72, share_encoder_decoder_embeddings=True)
    hf = MarianMTModel(hf_cfg).eval()
    cfg = marian.config_from_hf(hf_cfg)
    params = marian.marian_from_torch(
        {k: v for k, v in hf.state_dict().items()}, cfg, jnp.float32)
    return hf, cfg, params


def test_marian_teacher_forced_logits_parity(marian_pair):
    hf, cfg, params = marian_pair
    rng = np.random.default_rng(0)
    src = rng.integers(1, 70, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    src[1, 6:] = cfg.pad_token_id
    mask[1, 6:] = 0
    dec = rng.integers(1, 70, size=(2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(src),
                 attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    enc_h = marian.marian_encode(params, cfg, jnp.asarray(src, jnp.int32),
                                 jnp.asarray(mask))
    got = np.asarray(marian.marian_decode_logits(
        params, cfg, jnp.asarray(dec, jnp.int32), enc_h, jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_marian_greedy_generate_parity(marian_pair):
    """Greedy decode vs a manual HF argmax loop from decoder_start."""
    hf, cfg, params = marian_pair
    rng = np.random.default_rng(1)
    n_new = 6
    src = rng.integers(1, 70, size=(1, 7))
    mask = np.ones((1, 7), np.int64)

    dec = torch.tensor([[cfg.decoder_start_token_id]])
    ref_toks = []
    with torch.no_grad():
        for _ in range(n_new):
            nxt = hf(input_ids=torch.tensor(src),
                     attention_mask=torch.tensor(mask),
                     decoder_input_ids=dec).logits[:, -1].argmax(-1)
            ref_toks.append(int(nxt))
            dec = torch.cat([dec, nxt[:, None]], 1)

    got = marian.marian_greedy_generate(
        params, cfg, jnp.asarray(src, jnp.int32), jnp.asarray(mask),
        max_new_tokens=n_new)
    assert np.asarray(got)[0].tolist() == ref_toks


def test_marian_sinusoidal_table_matches_hf(marian_pair):
    """The position table is non-learned; MarianMTModel initialises it in
    _init_weights (the standalone module ctor leaves it random), so pin
    against the instantiated model's table."""
    hf, cfg, _ = marian_pair
    ref = hf.model.encoder.embed_positions.weight.detach().numpy()
    got = marian.sinusoidal_table(cfg.max_positions, cfg.d_model)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Refiner wiring (stub tokenizers; no checkpoints)
# ---------------------------------------------------------------------------

class StubTokenizer:
    eos_token_id = 2

    def encode(self, text):
        return list(range(4, 4 + max(3, len(text) % 7)))

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return " ".join(m["content"] for m in messages)

    def decode(self, toks, skip_special_tokens=True):
        return " ".join(f"t{t}" for t in toks)


def test_beautiful_prompt_appends_generation(bloom_pair):
    from physicedit_tpu.pipeline.prompt_refiners import (
        BEAUTIFUL_TEMPLATE_V1, BeautifulPrompt)

    _, cfg, params = bloom_pair
    ref = BeautifulPrompt(params, cfg, StubTokenizer())
    assert ref.template == BEAUTIFUL_TEMPLATE_V1
    out = ref("a cat", seed=0)
    # prompt_refiners.py:52-54: returns raw + ", " + generation
    assert out.startswith("a cat, ")
    assert len(out) > len("a cat, ")
    # negative prompts pass through untouched (prompt_refiners.py:49)
    assert ref("neg", positive=False) == "neg"


def test_translator_decodes_to_eos(marian_pair):
    from physicedit_tpu.pipeline.prompt_refiners import Translator

    _, cfg, params = marian_pair
    tr = Translator(params, cfg, StubTokenizer())
    out = tr("一只猫", max_new_tokens=5)
    assert isinstance(out, str)
    # every emitted id is pre-EOS (eos_token_id = 0 for this config)
    assert "t0" not in out.split()


def test_qwen_prompt_no_first_token_duplication(monkeypatch):
    """ADVICE r3 high: greedy_decode returns the first token at output
    position 0; __call__ must not prepend it again."""
    from physicedit_tpu.models import qwen_vl as m
    from physicedit_tpu.pipeline import prompt_refiners as pr

    cfg = m.TINY_TEXT
    eos = cfg.eos_token_id

    def fake_prefill(params, cfg_, emb, pos, mask, max_total_len,
                     **kwargs):
        logits = np.zeros((1, cfg_.vocab_size), np.float32)
        logits[0, 7] = 10.0   # first generated token = 7
        return jnp.asarray(logits), "CACHES", None

    def fake_greedy(params, cfg_, caches, first, start_pos, rope_pos,
                    max_new_tokens, key_mask=None):
        assert int(np.asarray(first)[0]) == 7
        toks = np.full((1, max_new_tokens), eos, np.int32)
        toks[0, :3] = [7, 8, 9]
        return jnp.asarray(toks), None

    monkeypatch.setattr(m, "prefill", fake_prefill)
    monkeypatch.setattr(m, "greedy_decode", fake_greedy)
    monkeypatch.setattr(
        m, "embed_tokens",
        lambda params, ids: jnp.zeros((np.asarray(ids).shape[0],
                                       cfg.hidden_size)))

    ref = pr.QwenPrompt(params={}, cfg=cfg, tokenizer=StubTokenizer())
    out = ref("一只猫", max_new_tokens=8)
    assert out.split() == ["t7", "t8", "t9"]   # 7 appears exactly once


def test_qwen_text_cfg_from_hf_forwards_head_dim():
    """ADVICE r3 medium: honour non-default head_dim / eos; pick a
    shape-valid mrope split for head_dim != 128."""
    from physicedit_tpu.pipeline.prompt_refiners import qwen_text_cfg_from_hf

    hf = {"vocab_size": 151936, "hidden_size": 896,
          "num_hidden_layers": 24, "num_attention_heads": 14,
          "num_key_value_heads": 2, "intermediate_size": 4864,
          "rope_theta": 1e6, "rms_norm_eps": 1e-6,
          "eos_token_id": [151645, 151643]}   # Qwen2-0.5B-Instruct shapes
    cfg = qwen_text_cfg_from_hf(hf)
    assert cfg.head_dim == 64
    assert sum(cfg.mrope_section) == 32
    assert cfg.eos_token_id == 151645
    hf["head_dim"] = 128   # explicit override wins
    assert qwen_text_cfg_from_hf(hf).head_dim == 128


def test_make_prompt_refiner_factory(monkeypatch):
    from physicedit_tpu.pipeline import prompt_refiners as pr

    calls = {}

    class Fake:
        @classmethod
        def from_pretrained(cls, path):
            calls["path"] = path
            inst = cls()
            return inst

        def __call__(self, prompt, positive=True):
            return prompt + "!"

    monkeypatch.setitem(pr.REFINER_KINDS, "qwen", Fake)
    fn = pr.make_prompt_refiner("qwen:/models/qwen2")
    assert calls["path"] == "/models/qwen2"
    assert fn("hello") == "hello!"
    assert pr.make_prompt_refiner(None) is None
    with pytest.raises(ValueError):
        pr.make_prompt_refiner("nope:/x")
    with pytest.raises(ValueError):
        pr.make_prompt_refiner("just-a-path")


def test_make_prompt_preprocessor_chains(monkeypatch, tmp_path):
    import argparse

    from physicedit_tpu.cli import serving
    from physicedit_tpu.pipeline import prompt_refiners as pr

    monkeypatch.setitem(
        pr.REFINER_KINDS, "translate",
        type("T", (), {"from_pretrained":
                       classmethod(lambda cls, path: lambda p, **k: p + " EN"),
                       }))
    script = tmp_path / "up.sh"
    script.write_text("#!/bin/sh\ntr a-z A-Z\n")
    script.chmod(0o755)
    args = argparse.Namespace(prompt_refiner="translate:/x",
                              prompt_rewriter_cmd=str(script))
    fn = serving.make_prompt_preprocessor(args)
    assert fn("cat") == "CAT EN"
    none_args = argparse.Namespace(prompt_refiner=None,
                                   prompt_rewriter_cmd=None)
    assert serving.make_prompt_preprocessor(none_args) is None
