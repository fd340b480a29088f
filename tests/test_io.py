"""Weight IO: key-hash detection parity and safetensors roundtrip."""

import numpy as np
import jax.numpy as jnp

from physicedit_tpu.io import safetensors_io as sio
from tests.conftest import requires_reference, load_ref_module


def test_hash_matches_reference_algorithm():
    sd = {
        "a.weight": np.zeros((2, 3)),
        "b.bias": np.zeros((4,)),
        "nested": {"c": np.zeros((1,))},
    }
    s = sio.state_dict_keys_str(sd)
    # Both "key:shape" and bare "key" entries, sorted (models/utils.py:148-161)
    assert "a.weight:2_3" in s and "a.weight," in s + ","
    assert "nested|c,c:1" in s


@requires_reference
def test_hash_identical_to_reference_impl():
    import torch

    ref_utils = load_ref_module("models.utils")
    sd_t = {"x.weight": torch.zeros(3, 5), "y.bias": torch.zeros(7)}
    sd_n = {"x.weight": np.zeros((3, 5)), "y.bias": np.zeros((7,))}
    assert sio.hash_state_dict_keys(sd_n) == ref_utils.hash_state_dict_keys(sd_t)


def test_detection_heuristics():
    dit_like = {"transformer_blocks.0.attn.add_q_proj.weight": np.zeros((1,))}
    assert sio.detect_model_name(dit_like) == "qwen_image_dit"
    vae_like = {"encoder.down_blocks.0.conv1.weight": np.zeros((1,)),
                "quant_conv.weight": np.zeros((1,))}
    assert sio.detect_model_name(vae_like) == "qwen_image_vae"
    vl_like = {"model.language_model.layers.0.self_attn.q_proj.weight": np.zeros((1,))}
    assert sio.detect_model_name(vl_like) == "qwen_image_text_encoder"
    cn_like = {"controlnet_blocks.0.input_proj.weight": np.zeros((1,))}
    assert sio.detect_model_name(cn_like) == "qwen_image_blockwise_controlnet"
    assert sio.detect_model_name({"junk": np.zeros((1,))}) is None


def test_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    path = str(tmp_path / "x.safetensors")
    save_file({"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, path)
    sd = sio.load_safetensors(path)
    # host numpy, not committed jax arrays (one device transfer per tensor
    # is ~80 ms under the tunnelled runtime — hours for a 20B checkpoint);
    # converters move to device once with the target dtype.
    assert isinstance(sd["w"], np.ndarray)
    np.testing.assert_allclose(np.asarray(sd["w"]),
                               np.arange(6, dtype=np.float32).reshape(2, 3))
    # folder loading
    sd2 = sio.load_state_dict(str(tmp_path))
    assert "w" in sd2


def test_pica100k_dataset_from_memory(tmp_path):
    datasets = __import__("pytest").importorskip("datasets")
    from PIL import Image as PILImage

    from physicedit_tpu.train.dataset import Pica100kDataset

    rng = np.random.default_rng(0)
    recs = {
        "source_image": [PILImage.fromarray(
            rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)) for _ in range(2)],
        "target_image": [PILImage.fromarray(
            rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)) for _ in range(2)],
        "prompt": ["tilt it", "drop it"],
    }
    ds = datasets.Dataset.from_dict(recs)
    ds.save_to_disk(str(tmp_path / "pica"))
    loader = Pica100kDataset(local_dataset_path=str(tmp_path / "pica"),
                             height=32, width=32)
    assert len(loader) == 2
    s = loader[1]
    assert s["prompt"] == "drop it"
    assert s["image"].size == (32, 32) and s["edit_image"].size == (32, 32)


def test_safetensors_detect_convert_roundtrip(tmp_path):
    """Disk -> detect -> convert: the ModelManager-equivalent load path."""
    from safetensors.numpy import save_file

    from physicedit_tpu.io.convert import dit_from_torch
    from physicedit_tpu.io import safetensors_io as sio
    from physicedit_tpu.models import dit as m_dit
    from tests.test_lora import synth_torch_dit_sd

    cfg = m_dit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                          txt_in_dim=48, patch_dim=64, time_dim=32)
    sd = synth_torch_dit_sd(cfg)
    path = str(tmp_path / "dit.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)

    loaded = sio.load_state_dict(path)
    assert sio.detect_model_name(loaded) == "qwen_image_dit"
    params = dit_from_torch(loaded, dtype=jnp.float32)
    assert params["blocks"]["attn"]["img_qkv"]["w"].shape == (2, 64, 192)
    np.testing.assert_allclose(
        np.asarray(params["img_in"]["w"]), sd["img_in.weight"].T, rtol=1e-6)


def test_lazy_package_exports():
    import physicedit_tpu as pkg

    assert pkg.PhysicEditPipeline.__name__ == "PhysicEditPipeline"
    assert pkg.TrainConfig().lora_rank == 128
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        pkg.not_a_thing
