"""Host-side VL preprocessing parity vs the HF processor / rope index."""

import numpy as np
import pytest

from physicedit_tpu.pipeline import vl_host

transformers = pytest.importorskip("transformers")


def test_image_to_patches_matches_hf_processor():
    from PIL import Image
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, size=(120, 200, 3), dtype=np.uint8))
    proc = Qwen2VLImageProcessor()
    ref = proc(images=[img], return_tensors="np")
    flat, grid = vl_host.image_to_patches(img)
    np.testing.assert_array_equal(ref["image_grid_thw"][0], np.asarray(grid))
    np.testing.assert_allclose(flat, ref["pixel_values"], rtol=2e-3, atol=2e-3)


def test_get_rope_index_matches_hf():
    import torch
    from tests.test_qwen_vl import _tiny_hf

    model, _, _ = _tiny_hf()
    img_id = model.config.image_token_id
    vstart = model.config.vision_start_token_id
    # text(3) [vstart, 6x img_pad] text(2) [vstart, 6x img_pad] text(4)
    grids = [(1, 4, 6), (1, 6, 4)]
    ids = ([10, 11, 12, vstart] + [img_id] * 6 + [13, 14, vstart]
           + [img_id] * 6 + [15, 16, 17, 18])
    ids_t = torch.tensor([ids])
    with torch.no_grad():
        ref_pos, deltas = model.model.get_rope_index(
            ids_t, image_grid_thw=torch.tensor(grids),
            attention_mask=torch.ones_like(ids_t))
    ours = vl_host.get_rope_index(np.asarray(ids), grids, img_id, vstart)
    np.testing.assert_array_equal(ours, ref_pos[:, 0].numpy())


def test_expand_image_pads():
    grids = [(1, 4, 6)]
    ids = [1, 2, 99, 3]
    out = vl_host.expand_image_pads(ids, grids, image_pad_id=99)
    assert out == [1, 2] + [99] * 6 + [3]


def test_smart_resize_divisible():
    h, w = vl_host.smart_resize(384, 384)
    assert h % 28 == 0 and w % 28 == 0
    h, w = vl_host.smart_resize(123, 4567)
    assert h % 28 == 0 and w % 28 == 0
