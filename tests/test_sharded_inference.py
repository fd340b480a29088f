"""Sharded inference: the tiny pipeline over a (1, 4) model-parallel mesh.

Verifies that the tensor-parallel parameter placement produces the same
edit as the single-device run (GSPMD correctness for the full denoise
program including the per-step special-token rewrite).
"""

import numpy as np
import pytest
import jax
from PIL import Image

from physicedit_tpu.parallel import sharding as sh
from tests.test_pipeline_e2e import build_tiny_pipeline


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_sharded_pipeline_matches_single_device():
    rng = np.random.default_rng(0)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    kw = dict(edit_image=edit, height=64, width=64, seed=5,
              num_inference_steps=2, have_text_reasoning=False,
              edit_image_auto_resize=False)

    pipe = build_tiny_pipeline()
    ref = np.asarray(pipe("tilt the lamp", **kw))

    mesh = sh.create_mesh(1, 4)
    pipe.shard(mesh)
    out = np.asarray(pipe("tilt the lamp", **kw))
    # Same math; different reduce orders under TP can move bf16/fp32 sums a
    # little — pixel-level tolerance.
    assert np.mean(np.abs(out.astype(np.float32) - ref.astype(np.float32))) < 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_vl_text_specs_cover_tree():
    from physicedit_tpu.models import qwen_vl as m_text
    from physicedit_tpu.pipeline.testing import _rand_text_params

    params = _rand_text_params(jax.random.PRNGKey(0), m_text.TINY_TEXT)
    specs = sh.qwen_vl_text_param_specs(params)
    flat_p = jax.tree_util.tree_structure(params)
    flat_s = jax.tree_util.tree_structure(specs)
    assert flat_p == flat_s


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_data_parallel_edit_batch_matches_unsharded():
    """BASELINE config #5 end state: batched edits data-parallel over the
    mesh's `data` axis (+ tensor-parallel weights) match unsharded runs."""
    rng = np.random.default_rng(3)
    ims = [Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
           for _ in range(2)]
    prompts = ["tilt the lamp", "move the red box"]
    kw = dict(height=64, width=64, seeds=[4, 8], num_inference_steps=2,
              have_text_reasoning=False)

    pipe = build_tiny_pipeline()
    ref = [np.asarray(o) for o in pipe.edit_batch(prompts, ims, **kw)]

    mesh = sh.create_mesh(2, 2)
    pipe.shard(mesh)
    outs = [np.asarray(o) for o in pipe.edit_batch(prompts, ims, **kw)]
    for a, b in zip(ref, outs):
        assert np.mean(np.abs(a.astype(np.float32) - b.astype(np.float32))) < 1.0
