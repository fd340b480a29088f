"""Qwen25VL_7b_Embedder (prompt-enhancement) logic tests."""

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.models import qwen_vl as VL
from physicedit_tpu.models import qwenvl_embedder as E


def test_split_string_quote_surgery():
    pad = "x" * 156
    s = pad + 'say "hi t" end'
    segs = E.split_string(s)
    # unquoted text stays in bulk segments; quoted chars become per-char
    # CJK-quoted segments (reference qwenvl.py:145-170)
    assert segs[0] == pad + 'say "'
    assert "“h”" in segs and "“i”" in segs and "“t”" in segs
    assert segs[-1] == '" end'   # closing quote opens the next bulk segment
    # quotes before index 155 are NOT split
    early = 'a "quoted" prompt'
    assert E.split_string(early) == [early]
    # curly/single quotes normalize to double quotes
    assert E.split_string("it’s".replace("’", "'")) == ['it"s']


def test_retokenize_with_quote_splice():
    old = [1, 2, 3, E.VISION_END_ID, 9, 9]

    # fake tokenizer: chars tokenize as ord(); "<VE>" -> VISION_END_ID;
    # CJK-quoted chars as [2073, ord(c), 854] so the strip branch triggers
    def tokenize_fn2(s):
        out = []
        i = 0
        while i < len(s):
            if s.startswith("<VE>", i):
                out.append(E.VISION_END_ID)
                i += 4
            elif s.startswith("“", i) and i + 2 < len(s) and s[i + 2] == "”":
                out.extend([2073, ord(s[i + 1]), 854])
                i += 3
            else:
                out.append(ord(s[i]))
                i += 1
        return out

    text2 = "prefix<VE>tail"
    got = E.retokenize_with_quote_splice(old, text2, tokenize_fn2)
    want = [1, 2, 3, E.VISION_END_ID] + [ord(c) for c in "tail"]
    assert got == want

    # quoted chars past 155 lose their CJK quote tokens in the splice
    text3 = "y" * 156 + '"q"<VE>z'
    got3 = E.retokenize_with_quote_splice(old, text3, tokenize_fn2)
    assert 2073 not in got3 and 854 not in got3


def test_extract_embeddings_layout():
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(1, 300, 8)).astype(np.float32))
    emb, mask = E.extract_embeddings(hidden, max_length=64, offset=217)
    assert emb.shape == (1, 64, 8) and mask.shape == (1, 64)
    n = min(64, 300 - 217)
    np.testing.assert_allclose(np.asarray(emb)[0, :n],
                               np.asarray(hidden)[0, 217:217 + n])
    assert np.asarray(mask)[0, :n].all() and not np.asarray(mask)[0, n:].any()
    # longer-than-max input truncates
    emb2, mask2 = E.extract_embeddings(hidden, max_length=32, offset=217)
    assert np.asarray(mask2).sum() == 32


def test_embed_end_to_end_tiny():
    cfg = VL.QwenVLTextConfig(num_layers=2, hidden_size=32, num_heads=2,
                              num_kv_heads=1, head_dim=16,
                              intermediate_size=48, vocab_size=151700,
                              mrope_section=(2, 3, 3), rope_theta=1e4)
    params = VL.init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = np.asarray([[5, 151652] + [151655] * 4 + [151653] + [7] * 230],
                     np.int32)
    vis = np.random.default_rng(1).normal(size=(4, 32)).astype(np.float32)
    emb, mask = E.embed(params, cfg, ids, vis, [(1, 4, 4)], max_length=64)
    assert emb.shape == (1, 64, 32)
    n = ids.shape[1] - E.PREFIX_TOKEN_OFFSET
    assert int(np.asarray(mask).sum()) == n
    assert np.isfinite(np.asarray(emb)).all()
