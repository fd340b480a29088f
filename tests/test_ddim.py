"""DDIM legacy scheduler parity vs the reference EnhancedDDIMScheduler."""

import numpy as np
import pytest

from physicedit_tpu.sampling import ddim
from tests.conftest import requires_reference, load_ref_module


@requires_reference
@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_ddim_trajectory_parity(prediction_type):
    import torch

    ref_mod = load_ref_module("schedulers.ddim")
    ref = ref_mod.EnhancedDDIMScheduler(prediction_type=prediction_type)
    ref.set_timesteps(10)
    sched = ddim.build_ddim_schedule(10)

    np.testing.assert_allclose(sched.timesteps, ref.timesteps.numpy(), atol=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    x_ref = torch.tensor(x)
    for i, t in enumerate(ref.timesteps):
        v = np.tanh(x if i == 0 else np.asarray(x_ref))
        x_ref = ref.step(torch.tensor(v), t, x_ref)
        x = ddim.ddim_step(x, v, sched.alpha_prod[i], sched.alpha_prod_prev[i],
                           prediction_type)
        np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-4, atol=1e-5)


@requires_reference
def test_ddim_add_noise_parity():
    import torch

    ref_mod = load_ref_module("schedulers.ddim")
    ref = ref_mod.EnhancedDDIMScheduler()
    sched = ddim.build_ddim_schedule(10)
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(2, 3)).astype(np.float32)
    eps = rng.normal(size=(2, 3)).astype(np.float32)
    t = torch.tensor([500])
    out_ref = ref.add_noise(torch.tensor(x0), torch.tensor(eps), t)
    out = ddim.ddim_add_noise(x0, eps, sched.alphas_cumprod[500])
    np.testing.assert_allclose(out, out_ref.numpy(), rtol=1e-5)


@requires_reference
def test_continuous_ode_trajectory_parity():
    import torch

    from physicedit_tpu.sampling import continuous_ode as ode

    ref_mod = load_ref_module("schedulers.continuous_ode")
    ref = ref_mod.ContinuousODEScheduler(num_inference_steps=8)
    sched = ode.build_ode_schedule(8)
    np.testing.assert_allclose(sched.sigmas, ref.sigmas.numpy(), rtol=1e-5)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    x_ref = torch.tensor(x.copy())
    x_our = x.copy()
    for i, t in enumerate(ref.timesteps):
        v = np.tanh(x_our)
        x_ref = ref.step(torch.tensor(v), t, x_ref.clone())
        x_our = ode.ode_step(x_our, v, sched.sigmas[i], sched.sigmas_next[i],
                             bool(sched.is_last[i]))
        np.testing.assert_allclose(x_our, x_ref.numpy(), rtol=1e-3, atol=1e-4)
