"""Hermetic tests for the full-depth quantization-divergence lane.

tools/quant_divergence.py regenerates per-block bf16 weights on-chip from
per-block PRNG keys instead of holding a 40.7 GB tree; these tests pin the
regen-scan forward against the production ``dit_forward`` on the SAME
parameters (tiny config, CPU), so the divergence curves measured on the
real chip are curves of the real model, not of a subtly different one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicedit_tpu.core.params import stack_trees
from physicedit_tpu.models import dit as jdit
from physicedit_tpu.ops.patchify import patchify, unpatchify
from tools.quant_divergence import (ALL_GROUPS, DivergenceLane, curves,
                                    make_spec)

CFG = jdit.DiTConfig(num_layers=3, dim=256, num_heads=4, head_dim=64,
                     txt_in_dim=128)


@pytest.fixture(autouse=True)
def _xla_w4a8_route(monkeypatch):
    """CPU tests can't lower the Pallas W4A8 / fused-quant kernels; the
    XLA int8 unpack+dot route is bit-equivalent (same quantized values,
    exact int32 accumulation) and the unfused modulate/GELU+quantize is
    the same math, so force both for every M."""
    from physicedit_tpu.kernels import quant_matmul as qm

    monkeypatch.setattr(qm, "_W4A8_IMPL", "xla")
    monkeypatch.setattr(qm, "_W4A8_XLA_MIN_M", 0)
    monkeypatch.setattr(jdit, "_FUSED_ACT_QUANT", False)


@pytest.fixture(scope="module")
def lane():
    return DivergenceLane(res=64, steps=4, seed=3, cfg=CFG, attn_impl="xla",
                          axes_dim=(16, 24, 24))


def _reference_trajectory(lane, steps):
    """The same trajectory via the production dit_forward on a stacked
    tree built from the SAME per-block keys + outer params."""
    dtype = jnp.bfloat16
    params = dict(lane.outer_bf16)
    params["blocks"] = stack_trees(
        [jdit.init_block_params(k, CFG, dtype) for k in lane.block_keys])
    h, w = lane.latent_hw
    s_base = (h // 2) * (w // 2)
    latents = lane.latents0
    out_steps = []
    for t in range(steps):
        img_tokens = patchify(latents.astype(dtype))
        img_tokens = jnp.concatenate([img_tokens, lane.extra], axis=1)
        img_tokens = jnp.tile(img_tokens, (2, 1, 1))
        t_norm = jnp.broadcast_to(lane.sigmas[t], (2,)).astype(dtype)
        out = jdit.dit_forward(params, CFG, img_tokens, lane.txt, t_norm,
                               *lane.tables, attn_impl="xla",
                               attn_clamp=False)[:, :s_base]
        v = unpatchify(out, h, w)
        v = v[1:] + 4.0 * (v[:1] - v[1:])
        latents = (latents.astype(jnp.float32)
                   + v.astype(jnp.float32)
                   * (lane.sigmas_next[t] - lane.sigmas[t])).astype(dtype)
        out_steps.append(np.asarray(latents[0], np.float32))
    return np.stack(out_steps)


def test_regen_scan_matches_dit_forward(lane):
    """The bf16 oracle lane must equal the production forward bit-for-bit
    (same keys -> same weights -> same op sequence)."""
    got = lane.run(make_spec(), tag="oracle")
    want = _reference_trajectory(lane, steps=4)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_w4a8_lane_diverges_but_stays_correlated(lane):
    ref = lane.run(make_spec(), tag="oracle")
    w4 = lane.run(make_spec(int4_groups=ALL_GROUPS), tag="w4a8")
    c = curves(ref, w4)
    assert c["rel_l2"][-1] > 1e-4          # int4 rounding is not a no-op
    assert c["cosine"][-1] > 0.9           # but the trajectory tracks
    # cumulative: divergence at the last step >= at the first step
    assert c["rel_l2"][-1] >= c["rel_l2"][0] * 0.5


def test_trunc_all_steps_equals_full_cfg(lane):
    """use_cfg all-True must be the identical program/trajectory."""
    w4 = lane.run(make_spec(int4_groups=ALL_GROUPS))
    trunc = lane.run(make_spec(int4_groups=ALL_GROUPS),
                     use_cfg=jnp.ones((4,), bool))
    np.testing.assert_array_equal(w4, trunc)


def test_trunc_k0_is_positive_only(lane):
    """k=0 takes the positive row's velocity at every step — it must
    differ from the CFG trajectory (cfg_scale 4 is not a no-op)."""
    w4 = lane.run(make_spec(int4_groups=ALL_GROUPS))
    pos = lane.run(make_spec(int4_groups=ALL_GROUPS),
                   use_cfg=jnp.zeros((4,), bool))
    assert np.abs(w4 - pos).max() > 1e-3


def test_single_group_spec_quantizes_only_that_group(lane):
    """Sensitivity lanes are strictly smaller perturbations than all-int4."""
    ref = lane.run(make_spec())
    all_q = curves(ref, lane.run(make_spec(int4_groups=ALL_GROUPS)))
    for g in ("mod", "fc2"):
        one = curves(ref, lane.run(make_spec(int4_groups=(g,))))
        assert 0 < one["rel_l2"][-1] < all_q["rel_l2"][-1] * 1.5


def test_int8_mixed_spec_is_tighter_than_int4(lane):
    """int8 on a group perturbs less than int4 on the same group."""
    ref = lane.run(make_spec())
    i4 = curves(ref, lane.run(make_spec(int4_groups=("fc2",))))
    i8 = curves(ref, lane.run(make_spec(int8_groups=("fc2",))))
    assert i8["rel_l2"][-1] < i4["rel_l2"][-1]
