"""Quality-metric registry behaviour (extensions/quality_metric.py)."""

import numpy as np
import pytest

from physicedit_tpu.extensions.quality_metric import (GatedMetricError,
                                                      download_preference_model,
                                                      load_preference_model,
                                                      model_dict)


def test_registry_names_match_reference():
    # reference model_dict keys (ImageQualityMetric/__init__.py:21-133)
    for name in ("ImageReward", "Aesthetic", "PickScore", "CLIP",
                 "HPSv2", "HPSv2.1", "MPS"):
        assert name in model_dict


def test_download_resolves_paths_without_network():
    paths = download_preference_model("Aesthetic", cache_dir="/tmp/qm")
    assert paths["clip-large"].endswith("clip-vit-large-patch14")


def test_checkpoint_backed_metrics_gate_cleanly():
    with pytest.raises(GatedMetricError):
        load_preference_model("CLIP",
                              path={"clip": "/nonexistent/clip"})
    with pytest.raises(GatedMetricError):
        load_preference_model("ImageReward")


def test_reference_free_metrics():
    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3)).astype(np.float32)
    noisy = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.05,
                    0, 1)

    psnr = load_preference_model("PSNR")
    assert psnr.score(a, a) == float("inf")
    assert 20.0 < psnr.score(noisy, a) < 40.0

    ssim = load_preference_model("SSIM")
    s_same, s_noisy = ssim.score([a, noisy], a)
    assert s_same > 0.99 and s_noisy < s_same
