"""Adapter parity tests against the reference helpers.py modules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.models import adapters as jad
from physicedit_tpu.io import convert as C
from tests.conftest import requires_reference, load_ref_module


@requires_reference
def test_perceiver_resampler_parity():
    import torch

    helpers = load_ref_module("pipelines.helpers")
    torch.manual_seed(0)
    ref = helpers.PerceiverResampler(dim=64, depth=2, num_latents=8,
                                     max_num_media_tokens=128).eval()
    params = C.perceiver_from_torch(ref.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 50, 64)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x))
    out = jad.perceiver_resampler(params, jnp.asarray(x))
    assert out.shape == (2, 8, 64)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-4)


@requires_reference
def test_visual_thinking_adapter_parity():
    import torch

    helpers = load_ref_module("pipelines.helpers")
    torch.manual_seed(1)
    ref = helpers.VisualThinkingAdapter(in_dim=32, out_dim=48).eval()
    params = C.visual_thinking_from_torch(ref.state_dict(), dtype=jnp.float32)
    x = np.random.default_rng(1).normal(size=(3, 5, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x))
    out = jad.visual_thinking_adapter(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-5, atol=1e-5)


@requires_reference
def test_dual_adapter_parity_and_loss():
    import torch

    helpers = load_ref_module("pipelines.helpers")
    torch.manual_seed(2)
    t_min, t_max = 20.0, 1000.0
    ref = helpers.VisualThinkingDualAdapter(in_dim=32, out_dim=32,
                                            t_min=t_min, t_max=t_max).eval()
    params = C.dual_adapter_from_torch(ref.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 32)).astype(np.float32)
    gt_dino = rng.normal(size=(2, 4, 32)).astype(np.float32)
    gt_vae = rng.normal(size=(2, 4, 32)).astype(np.float32)
    for t in [0.0, 333.0, 999.0]:
        ts = np.full((2,), t, np.float32)
        with torch.no_grad():
            mixed_ref, dino_ref, vae_ref = ref(torch.tensor(x), torch.tensor(ts))
            loss_ref = ref.get_loss(dino_ref, vae_ref, torch.tensor(gt_dino),
                                    torch.tensor(gt_vae), torch.tensor(ts))
        mixed, dino, vae = jad.dual_adapter_forward(
            params, jnp.asarray(x), jnp.asarray(ts), t_min, t_max)
        loss = jad.dual_adapter_loss(dino, vae, jnp.asarray(gt_dino),
                                     jnp.asarray(gt_vae), jnp.asarray(ts), t_min, t_max)
        np.testing.assert_allclose(np.asarray(mixed), mixed_ref.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


@pytest.mark.slow
def test_perceiver_init_runs():
    p = jad.init_perceiver_params(jax.random.PRNGKey(0), dim=64, num_latents=8,
                                  max_num_media_tokens=64)
    out = jad.perceiver_resampler(p, jnp.ones((1, 10, 64)))
    assert out.shape == (1, 8, 64)
    assert np.isfinite(np.asarray(out)).all()
