"""PSNR / SSIM parity metrics."""

import numpy as np

from physicedit_tpu.eval import metrics as M


def test_psnr_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    assert M.psnr(img, img) == float("inf")
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    p = M.psnr(img, noisy)
    assert 15 < p < 25  # sigma 0.1 -> ~20 dB


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    assert M.ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s = M.ssim(img, noisy)
    assert 0.0 < s < 0.9
    # SSIM should rank a lightly-blurred copy above heavy noise


def test_parity_report_keys():
    rng = np.random.default_rng(2)
    a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    rep = M.parity_report(a, a)
    assert rep["ssim"] > 0.999 and rep["psnr"] == float("inf")


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp

    from physicedit_tpu.train.logging_utils import StepTimer, profile_trace

    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    assert os.path.isdir(tmp_path / "trace")

    t = StepTimer()
    with t.stage("x"):
        pass
    assert "x" in t.summary()
