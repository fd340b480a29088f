"""Video-mode VAE parity vs the reference torch QwenImageVAE (5D input).

Same narrow-but-structurally-identical setup as test_vae.py (base_dim=8).
Pins the reference behaviour documented in models/vae3d.py: causal 3D
convs over the clip, per-frame spatial resampling, NO temporal
compression on the non-cache path.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from physicedit_tpu.io.convert import vae_from_torch, vae_video_from_torch
from physicedit_tpu.models import vae as jvae
from physicedit_tpu.models import vae3d as jvae3d
from tests.conftest import load_ref_module, requires_reference

SMALL = jvae.VAEConfig(base_dim=8)


def _make_ref_vae():
    import torch

    ref_mod = load_ref_module("models.qwen_image_vae")
    torch.manual_seed(0)
    return ref_mod.QwenImageVAE(base_dim=8).eval()


@requires_reference
@pytest.mark.slow
def test_video_encode_parity():
    import torch

    ref = _make_ref_vae()
    params = vae_video_from_torch(ref.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    vid = rng.uniform(-1, 1, size=(1, 3, 5, 32, 32)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.tensor(vid))  # [B, 16, T, h, w]
    assert z_ref.shape == (1, 16, 5, 4, 4)  # no temporal compression
    z_ours = jvae3d.encode(params, jnp.asarray(vid.transpose(0, 2, 3, 4, 1)),
                           SMALL)
    np.testing.assert_allclose(
        np.asarray(z_ours).transpose(0, 4, 1, 2, 3), z_ref.numpy(),
        rtol=1e-3, atol=1e-4)


@requires_reference
@pytest.mark.slow
def test_video_decode_parity():
    import torch

    ref = _make_ref_vae()
    params = vae_video_from_torch(ref.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 16, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        v_ref = ref.decode(torch.tensor(z))  # [B, 3, T, H, W]
    v_ours = jvae3d.decode(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                           SMALL)
    np.testing.assert_allclose(
        np.asarray(v_ours).transpose(0, 4, 1, 2, 3), v_ref.numpy(),
        rtol=1e-3, atol=1e-3)


@requires_reference
@pytest.mark.slow
def test_video_t1_matches_image_mode():
    """A T=1 clip through video mode == the 2D image path (the last-tap
    reduction the image converter bakes in)."""
    ref = _make_ref_vae()
    params3d = vae_video_from_torch(ref.state_dict(), dtype=jnp.float32)
    params2d = vae_from_torch(ref.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    z3 = jvae3d.encode(params3d, jnp.asarray(img)[:, None], SMALL)[:, 0]
    z2 = jvae.encode(params2d, jnp.asarray(img), SMALL)
    np.testing.assert_allclose(np.asarray(z3), np.asarray(z2),
                               rtol=1e-5, atol=1e-5)


@requires_reference
@pytest.mark.slow
def test_video_causality():
    """Frame t's latent must not depend on frames > t (causal convs)."""
    ref = _make_ref_vae()
    params = vae_video_from_torch(ref.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    vid = rng.uniform(-1, 1, size=(1, 4, 32, 32, 3)).astype(np.float32)
    z_a = np.asarray(jvae3d.encode(params, jnp.asarray(vid), SMALL))
    vid_b = vid.copy()
    vid_b[:, 2:] = rng.uniform(-1, 1, size=vid_b[:, 2:].shape)
    z_b = np.asarray(jvae3d.encode(params, jnp.asarray(vid_b), SMALL))
    np.testing.assert_allclose(z_a[:, :2], z_b[:, :2], rtol=1e-5, atol=1e-5)
    assert np.abs(z_a[:, 2:] - z_b[:, 2:]).max() > 1e-3
