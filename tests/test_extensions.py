"""Parity tests for the legacy extension zoo (SURVEY M7) vs the reference
torch implementations (diffsynth/extensions/{ESRGAN,RIFE})."""

import numpy as np
import pytest
import jax.numpy as jnp
import jax

from tests.conftest import load_ref_module, requires_reference


def _torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


# ---------------------------------------------------------------------------
# ESRGAN
# ---------------------------------------------------------------------------

@requires_reference
def test_esrgan_rrdbnet_parity():
    torch = _torch()
    ref = load_ref_module("extensions.ESRGAN")
    net = ref.RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2,
                      num_grow_ch=8).eval()
    # non-degenerate random weights
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    from physicedit_tpu.extensions.esrgan import (esrgan_from_torch,
                                                  rrdbnet_forward)

    params = esrgan_from_torch(net.state_dict())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32) * 0.5 + 0.5

    with torch.no_grad():
        ref_out = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = rrdbnet_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    assert out.shape == (2, 64, 96, 3)


@pytest.mark.slow
def test_esrgan_upscale_host_wrapper():
    from PIL import Image

    from physicedit_tpu.extensions.esrgan import init_esrgan_params, upscale

    params = init_esrgan_params(jax.random.PRNGKey(0), num_feat=8,
                                num_block=1, num_grow_ch=4)
    im = Image.fromarray(
        (np.random.default_rng(0).random((16, 20, 3)) * 255).astype(np.uint8))
    out = upscale(params, im)
    assert out.size == (80, 64)          # 4x, PIL (W, H)
    outs = upscale(params, [im, im], batch_size=1)
    assert len(outs) == 2 and outs[0].size == (80, 64)


# ---------------------------------------------------------------------------
# RIFE
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.slow
def test_rife_resize_matches_torch_interpolate():
    torch = _torch()
    import torch.nn.functional as F

    from physicedit_tpu.extensions.rife import _resize_bilinear

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 48, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for scale in (0.25, 0.5, 2.0):
        want = F.interpolate(xt, scale_factor=scale, mode="bilinear",
                             align_corners=False,
                             recompute_scale_factor=False)
        got = _resize_bilinear(jnp.asarray(x), int(32 * scale), int(48 * scale))
        np.testing.assert_allclose(np.asarray(got),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5, rtol=1e-5)


@requires_reference
def test_rife_warp_matches_reference_grid_sample():
    torch = _torch()
    ref = load_ref_module("extensions.RIFE")

    from physicedit_tpu.extensions.rife import warp

    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    flow = (rng.normal(size=(2, 16, 24, 2)) * 3).astype(np.float32)
    want = ref.warp(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                    torch.from_numpy(flow.transpose(0, 3, 1, 2)),
                    device="cpu")
    got = warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-4)


@requires_reference
def test_rife_ifnet_parity():
    torch = _torch()
    ref = load_ref_module("extensions.RIFE")
    net = ref.IFNet().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    from physicedit_tpu.extensions.rife import ifnet_forward, ifnet_from_torch

    params = ifnet_from_torch(net.state_dict())
    rng = np.random.default_rng(3)
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(
            np.concatenate([img0, img1], -1).transpose(0, 3, 1, 2))
        flow_list, mask, merged = net(x, scale_list=[4, 2, 1])
    flow_j, mask_j, merged_j = ifnet_forward(
        params, jnp.asarray(img0), jnp.asarray(img1))

    np.testing.assert_allclose(np.asarray(flow_j),
                               flow_list[2].numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mask_j),
                               mask.numpy().transpose(0, 2, 3, 1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(merged_j),
                               merged[2].numpy().transpose(0, 2, 3, 1),
                               atol=5e-4)


@pytest.mark.slow
def test_rife_interpolater_doubles_frames():
    from PIL import Image

    from physicedit_tpu.extensions.rife import (RIFEInterpolater,
                                                RIFESmoother,
                                                init_ifnet_params)

    params = init_ifnet_params(jax.random.PRNGKey(0), c=16)
    rng = np.random.default_rng(4)
    frames = [Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
              for _ in range(3)]
    out = RIFEInterpolater(params).interpolate(frames)
    assert len(out) == 5 and out[0].size == (64, 64)
    smoothed = RIFESmoother(params)(frames)
    assert len(smoothed) == 3
