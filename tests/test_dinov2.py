"""DINOv2 parity against HF Dinov2WithRegistersModel (random weights).

The reference wraps this exact HF class (diffsynth/pipelines/dinov2.py:8-35),
so the HF model *is* the oracle; no reference-repo import needed.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from physicedit_tpu.models import dinov2 as jdino
from physicedit_tpu.io.convert import dinov2_from_torch

transformers = pytest.importorskip("transformers")


def _tiny_pair(seed=0):
    import torch
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(seed)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        patch_size=14, num_register_tokens=4, image_size=224,
        layerscale_value=0.5)
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    cfg = jdino.DinoV2Config(hidden_size=64, num_layers=2, num_heads=2)
    params = dinov2_from_torch(model.state_dict(), dtype=jnp.float32)
    return model, cfg, params


def test_dinov2_parity_native_grid():
    import torch

    model, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).last_hidden_state  # [B, 1+4+256, 64]
    # Emulate the PhysicEdit wrapper: strip final-LN affine, drop 5 tokens.
    # HF applies the affine; invert it to get the normalise-only output.
    w = model.layernorm.weight.detach().numpy()
    b = model.layernorm.bias.detach().numpy()
    ref_naked = (ref.numpy() - b) / w
    ours = jdino.dinov2_features(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours), ref_naked[:, 5:], rtol=5e-4, atol=5e-4)


def test_dinov2_parity_interpolated_grid():
    import torch

    model, cfg, params = _tiny_pair(1)
    rng = np.random.default_rng(1)
    # 280x336 -> 20x24 patch grid != the 16x16 training grid.
    x = rng.normal(size=(1, 3, 280, 336)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).last_hidden_state
    w = model.layernorm.weight.detach().numpy()
    b = model.layernorm.bias.detach().numpy()
    ref_naked = (ref.numpy() - b) / w
    ours = jdino.dinov2_features(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert ours.shape == (1, 20 * 24, 64)
    # Interpolation methods differ slightly (torch bicubic+antialias vs
    # jax.image bicubic); the bar is feature-level, not bitwise.
    err = np.abs(np.asarray(ours) - ref_naked[:, 5:]).max()
    scale = np.abs(ref_naked[:, 5:]).max()
    assert err / scale < 0.05, f"relative error too large: {err / scale}"
