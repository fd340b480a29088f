"""Reasoner JSON contract + bitwise noise parity with the reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from physicedit_tpu.pipeline import prompt as P
from tests.conftest import requires_reference


def test_parse_accepted_field_sets():
    ok = P.parse_reasoner_response('{"middle_transition_prompt": "x"}')
    assert ok == {"middle_transition_prompt": "x"}
    ok = P.parse_reasoner_response(
        'noise {"physical_reasoning": "a", "middle_transition_prompt": "b", '
        '"final_state_prompt": "c"} trailing')
    assert set(ok) == {"physical_reasoning", "middle_transition_prompt",
                       "final_state_prompt"}
    # deterministic field order (declaration order) — the conditioning text
    # must not depend on per-process str-hash salt (multihost SPMD safety);
    # JSON key order in the response must not matter either
    assert list(ok) == ["Reasoning", "physical_reasoning",
                        "middle_transition_prompt", "final_state_prompt"][1:]
    ok2 = P.parse_reasoner_response(
        '{"final_state_prompt": "c", "middle_transition_prompt": "b", '
        '"physical_reasoning": "a"}')
    assert list(ok2) == list(ok)
    ok = P.parse_reasoner_response('{"Reasoning": " r "}')
    assert ok == {"Reasoning": "r"}


def test_parse_rejects_bad_shapes():
    with pytest.raises(ValueError):
        P.parse_reasoner_response("no json here")
    with pytest.raises(ValueError):
        P.parse_reasoner_response('{"middle_transition_prompt": 3}')
    with pytest.raises(ValueError):
        P.parse_reasoner_response('{"unexpected": "x"}')


def test_reasoner_text_fallback():
    # Malformed output falls back to the raw text (generate_text, :866-869)
    assert P.reasoner_text_from_response("plain text") == "plain text"
    out = P.reasoner_text_from_response('{"middle_transition_prompt": "m"}')
    assert out == "\nmiddle_transition_prompt: m"


@requires_reference
def test_noise_bitstream_matches_reference():
    """Our torch-backend noise == reference generate_noise, bit for bit."""
    import torch

    from tests.conftest import load_ref_module
    from tests.test_pipeline_e2e import build_tiny_pipeline

    ref_utils_mod = load_ref_module("utils") if False else None
    # Reference semantics (utils/__init__.py:119-124): CPU generator,
    # torch.randn in the pipeline dtype.
    gen = torch.Generator("cpu").manual_seed(42)
    ref = torch.randn((1, 16, 8, 8), generator=gen, dtype=torch.bfloat16)

    pipe = build_tiny_pipeline()
    pipe.dtype = jnp.bfloat16
    ours = pipe.generate_noise((1, 8, 8, 16), seed=42, backend="torch")
    np.testing.assert_array_equal(
        np.asarray(ours.astype(jnp.float32)).transpose(0, 3, 1, 2),
        ref.float().numpy())
