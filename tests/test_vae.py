"""VAE parity tests against the reference torch QwenImageVAE (random weights).

Uses a narrow (base_dim=8) but structurally identical VAE: same stage count,
res-block count, mid attention, z_dim 16 and fixed latent normalisation.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from physicedit_tpu.models import vae as jvae
from physicedit_tpu.io.convert import vae_from_torch
from tests.conftest import requires_reference, load_ref_module

SMALL = jvae.VAEConfig(base_dim=8)


def _make_ref_vae():
    import torch

    ref_mod = load_ref_module("models.qwen_image_vae")
    torch.manual_seed(0)
    return ref_mod.QwenImageVAE(base_dim=8).eval()


@requires_reference
@pytest.mark.slow
def test_encode_parity():
    import torch

    ref = _make_ref_vae()
    params = vae_from_torch(ref.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.tensor(img))  # [B, 16, 8, 8]
    z_ours = jvae.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)), SMALL)
    np.testing.assert_allclose(
        np.asarray(z_ours).transpose(0, 3, 1, 2), z_ref.numpy(), rtol=1e-3, atol=1e-4)


@requires_reference
def test_decode_parity():
    import torch

    ref = _make_ref_vae()
    params = vae_from_torch(ref.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.decode(torch.tensor(z))  # [B, 3, 64, 64]
    img_ours = jvae.decode(params, jnp.asarray(z.transpose(0, 2, 3, 1)), SMALL)
    np.testing.assert_allclose(
        np.asarray(img_ours).transpose(0, 3, 1, 2), img_ref.numpy(), rtol=1e-3, atol=1e-3)


@requires_reference
@pytest.mark.slow
def test_roundtrip_shapes():
    ref = _make_ref_vae()
    params = vae_from_torch(ref.state_dict(), dtype=jnp.float32)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    z = jvae.encode(params, img, SMALL)
    assert z.shape == (1, 8, 12, 16)
    out = jvae.decode(params, z, SMALL)
    assert out.shape == (1, 64, 96, 3)


@requires_reference
def test_vae_init_structure_matches_converter():
    """init_vae_params must stay tree-compatible with converted checkpoints
    (else shape tests and benches drift from the real model)."""
    import jax

    from physicedit_tpu.models.vae_init import init_vae_params

    ref = _make_ref_vae()
    converted = vae_from_torch(ref.state_dict(), dtype=jnp.float32)
    initialised = init_vae_params(SMALL, jnp.float32)
    ts_a = jax.tree_util.tree_structure(converted)
    ts_b = jax.tree_util.tree_structure(initialised)
    assert ts_a == ts_b
    shapes_a = jax.tree_util.tree_map(lambda x: x.shape, converted)
    shapes_b = jax.tree_util.tree_map(lambda x: x.shape, initialised)
    assert shapes_a == shapes_b
