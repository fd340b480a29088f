"""Hermetic tests for the mixed-resolution serving composition
(tools/mixed_res_serving.py) — the measurement lane runs on the chip, the
math that turns stage measurements into the reported numbers is pinned
here (same discipline as tests/test_bench_compose.py)."""

import math

import numpy as np
import pytest

from tools.mixed_res_serving import (DEFAULT_MIX, cond_per_item,
                                     fit_step_model, joint_tokens,
                                     sample_stream, simulate, step_at)

# A synthetic-but-plausible stage/vl fixture (seconds), shaped like the
# bench cache: vl {b: (prefill_s, tok_s_total)}, amortised singles.
VL = {1: (0.115, 0.0061), 2: (0.263, 0.0060), 4: (0.513, 0.0065),
      8: (0.930, 0.0076)}
STAGE = {"vision_s": 0.090, "vision8_item_s": 0.012,
         "vae_encode_s": 0.083, "vae_encode8_item_s": 0.020,
         "vae_decode_s": 0.122, "vae_decode8_item_s": 0.053}


def _coef(a=0.05, b=2.0e-4, c=1.2e-8):
    """step(S) = a + b*S + c*S^2 ground truth."""
    return np.asarray([a, b, c])


def test_fit_recovers_quadratic_exactly():
    truth = _coef()
    measured = {(gh, gw): step_at(truth, gh, gw)
                for (gh, gw) in ((64, 64), (48, 64), (84, 48), (32, 32),
                                 (56, 72))}
    coef, rel = fit_step_model(measured)
    np.testing.assert_allclose(coef, truth, rtol=1e-6)
    assert rel < 1e-9


def test_joint_tokens_matches_serving_shape():
    # 1024-sq: 64x64 grid -> 2*4096 + 256 = 8448 (the measured headline S)
    assert joint_tokens(64, 64) == 8448


def test_sample_stream_deterministic_and_quantised():
    a = sample_stream(DEFAULT_MIX, 200, seed=3)
    b = sample_stream(DEFAULT_MIX, 200, seed=3)
    assert a == b
    assert all(w % 32 == 0 and h % 32 == 0 and w >= 256 and h >= 256
               for w, h in a)
    # the jittered mix fragments into many /32 buckets (the phenomenon
    # the per-bucket mode suffers from)
    assert len(set(a)) > 20


def test_cond_per_item_decreases_with_depth():
    c1 = cond_per_item(1, VL, STAGE)
    c4 = cond_per_item(4, VL, STAGE)
    c8 = cond_per_item(8, VL, STAGE)
    assert c1 > c4 > c8
    # depth-8 conditioning must match the bench compose_serving math
    # for the same inputs (same formula at m=8)
    pre1, pre4 = VL[1][0], VL[4][0]
    cond = 8 * pre1 + math.ceil(16 / 4) * pre4 + 1000 * VL[8][1]
    expect = (cond / 8 + STAGE["vision8_item_s"]
              + STAGE["vae_encode8_item_s"] + STAGE["vae_decode8_item_s"])
    assert c8 == pytest.approx(expect, rel=1e-9)


def test_simulate_mixed_beats_per_bucket_on_fragmented_mix():
    sizes = sample_stream(DEFAULT_MIX, 900, seed=0)
    sim = simulate(sizes, 8, _coef(), VL, STAGE)
    # mixed mode: full flushes by construction
    assert sim["mixed"]["fill"] > 0.99
    # fragmented native mix leaves per-bucket flushes partial
    assert sim["per_bucket"]["fill"] < sim["mixed"]["fill"]
    assert (sim["per_bucket"]["cond_item_s"]
            > sim["mixed"]["cond_item_s"])
    assert (sim["mixed"]["edits_per_min"]
            > sim["per_bucket"]["edits_per_min"])
    # denoise cost is mode-independent
    assert sim["mixed"]["item_s"] - sim["mixed"]["cond_item_s"] == (
        pytest.approx(sim["per_bucket"]["item_s"]
                      - sim["per_bucket"]["cond_item_s"]))


def test_simulate_uniform_mix_modes_agree():
    """On a single-bucket stream the two modes are the same batching."""
    sizes = [(1024, 1024)] * 64
    sim = simulate(sizes, 8, _coef(), VL, STAGE)
    assert sim["n_buckets"] == 1
    assert sim["mixed"]["item_s"] == pytest.approx(
        sim["per_bucket"]["item_s"])
    assert sim["mixed"]["fill"] == 1.0 == sim["per_bucket"]["fill"]
