"""Scheduler math: unit tests + parity against the reference FlowMatchScheduler."""

import numpy as np
import pytest

from physicedit_tpu.sampling import flow_match as fm
from tests.conftest import requires_reference


def test_qwen_inference_schedule_shape_and_range():
    sched = fm.qwen_inference_schedule(40, height=1024, width=1024)
    assert sched.num_steps == 40
    # First sigma is 1 (pure noise), last is the shift_terminal value.
    assert sched.sigmas[0] == pytest.approx(1.0, abs=1e-6)
    assert sched.sigmas[-1] == pytest.approx(0.02, abs=1e-5)
    assert np.all(np.diff(sched.sigmas) < 0)
    np.testing.assert_allclose(sched.timesteps, sched.sigmas * 1000, rtol=1e-6)
    # Next-sigma array is shifted by one with terminal 0.
    np.testing.assert_allclose(sched.sigmas_next[:-1], sched.sigmas[1:])
    assert sched.sigmas_next[-1] == 0.0


@pytest.mark.parametrize("steps", [1, 2, 40])
def test_schedule_always_finite(steps):
    """Round-1 regression: with steps=1 + extra_one_step the single sigma is
    exactly 1, the shift_terminal rescale was 0/0, and a NaN schedule
    poisoned the whole denoise (silently - the e2e test stayed green)."""
    sched = fm.qwen_inference_schedule(steps, height=64, width=64)
    assert np.isfinite(sched.sigmas).all()
    assert np.isfinite(sched.timesteps).all()
    assert np.isfinite(sched.sigmas_next).all()
    if steps > 1:
        assert sched.sigmas[-1] == pytest.approx(0.02, abs=1e-5)


def test_dynamic_shift_moves_schedule():
    lo = fm.qwen_inference_schedule(40, height=256, width=256)
    hi = fm.qwen_inference_schedule(40, height=1024, width=1024)
    # Larger images get a larger mu => more time spent at high noise.
    assert hi.sigmas[20] > lo.sigmas[20]


def test_adapter_t_range():
    t_min, t_max = fm.adapter_t_range()
    assert t_max == pytest.approx(1000.0, abs=1e-3)
    assert t_min == pytest.approx(20.0, abs=1e-2)


def test_training_schedule_weights():
    sched = fm.qwen_training_schedule()
    assert sched.num_steps == 1000
    assert sched.weights is not None
    assert sched.weights.shape == (1000,)
    # Weights are non-negative and average ~1.
    assert np.all(sched.weights >= 0)
    assert sched.weights.sum() == pytest.approx(1000.0, rel=1e-4)


def test_step_rules():
    x = np.ones((2, 3))
    v = np.full((2, 3), 0.5)
    out = fm.euler_step(x, v, sigma=0.8, sigma_next=0.6)
    np.testing.assert_allclose(out, x + 0.5 * (0.6 - 0.8))

    x0, eps = np.zeros((4,)), np.ones((4,))
    np.testing.assert_allclose(fm.add_noise(x0, eps, 0.3), 0.3 * eps)
    np.testing.assert_allclose(fm.training_target(x0, eps), eps - x0)


@requires_reference
@pytest.mark.parametrize(
    "steps,kwargs",
    [
        (40, dict(dynamic_shift_len=(1024 // 16) * (1024 // 16))),
        (40, dict(dynamic_shift_len=(480 // 16) * (832 // 16))),
        (100, dict()),
        (30, dict(exponential_shift_mu=0.5)),
    ],
)
def test_parity_with_reference_scheduler(ref_diffsynth, steps, kwargs):
    from tests.conftest import load_ref_module
    FlowMatchScheduler = load_ref_module('schedulers.flow_match').FlowMatchScheduler
    ref = FlowMatchScheduler(
        sigma_min=0, sigma_max=1, extra_one_step=True,
        exponential_shift=True, exponential_shift_mu=0.8, shift_terminal=0.02,
    )
    ref.set_timesteps(steps, **kwargs)
    ours = fm.build_schedule(steps, fm.QWEN_IMAGE_CONFIG, **kwargs)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), rtol=1e-5, atol=1e-4)


@requires_reference
def test_parity_training_weights(ref_diffsynth):
    from tests.conftest import load_ref_module
    FlowMatchScheduler = load_ref_module('schedulers.flow_match').FlowMatchScheduler
    ref = FlowMatchScheduler(
        sigma_min=0, sigma_max=1, extra_one_step=True,
        exponential_shift=True, exponential_shift_mu=0.8, shift_terminal=0.02,
    )
    ref.set_timesteps(1000, training=True)
    ours = fm.qwen_training_schedule()
    np.testing.assert_allclose(
        ours.weights, ref.linear_timesteps_weights.numpy(), rtol=1e-4, atol=1e-6
    )


@requires_reference
def test_parity_euler_trajectory(ref_diffsynth):
    """Full 40-step Euler rollout with a synthetic velocity field."""
    import torch
    from tests.conftest import load_ref_module
    FlowMatchScheduler = load_ref_module('schedulers.flow_match').FlowMatchScheduler
    ref = FlowMatchScheduler(
        sigma_min=0, sigma_max=1, extra_one_step=True,
        exponential_shift=True, exponential_shift_mu=0.8, shift_terminal=0.02,
    )
    ref.set_timesteps(40, dynamic_shift_len=64 * 64)
    ours = fm.build_schedule(40, fm.QWEN_IMAGE_CONFIG, dynamic_shift_len=64 * 64)

    rng = np.random.default_rng(0)
    x_ref = torch.tensor(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
    x_our = x_ref.numpy().copy()
    for i, t in enumerate(ref.timesteps):
        v = np.tanh(x_our)  # deterministic fake model
        x_ref = ref.step(torch.tensor(v), t, x_ref)
        x_our = fm.euler_step(x_our, v, ours.sigmas[i], ours.sigmas_next[i])
        np.testing.assert_allclose(x_our, x_ref.numpy(), rtol=1e-4, atol=1e-5)
