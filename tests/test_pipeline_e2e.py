"""End-to-end edit pipeline on tiny random models with a fake tokenizer.

The reference has no automated tests at all (SURVEY.md section 4); this is
the tier-4 CLI-equivalent check: a full edit (VAE encode -> VL prompt encode
with special tokens -> CFG denoise scan with per-step token rewrite -> VAE
decode) on random weights, asserting shapes, finiteness and determinism.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from physicedit_tpu.models import dit as m_dit
from physicedit_tpu.models import qwen_vl as m_text
from physicedit_tpu.models import qwen_vl_vision as m_vis
from physicedit_tpu.models import vae as m_vae
from physicedit_tpu.models import adapters as m_ad
from physicedit_tpu.models.vae_init import init_vae_params
from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
from physicedit_tpu.io import convert as Cv
from physicedit_tpu.pipeline.testing import (FakeTokenizer,  # noqa: F401 — re-exported for sibling tests
                                             build_tiny_pipeline)



@pytest.fixture(scope="module")
def tiny_pipe():
    return build_tiny_pipeline()


def test_full_edit(tiny_pipe):
    rng = np.random.default_rng(0)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out = tiny_pipe(
        "make the ball fall", edit_image=edit, height=64, width=64, seed=7,
        num_inference_steps=3, have_text_reasoning=False,
        edit_image_auto_resize=False)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    assert arr.shape == (64, 64, 3)


def test_full_edit_deterministic(tiny_pipe):
    rng = np.random.default_rng(1)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    kw = dict(edit_image=edit, height=64, width=64, seed=3,
              num_inference_steps=2, have_text_reasoning=False,
              edit_image_auto_resize=False)
    a = np.asarray(tiny_pipe("prompt one", **kw))
    b = np.asarray(tiny_pipe("prompt one", **kw))
    np.testing.assert_array_equal(a, b)


def test_reasoner_runs(tiny_pipe):
    rng = np.random.default_rng(2)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    txt = tiny_pipe.reason_physical("tilt the cup", edit, max_new_tokens=4)
    assert isinstance(txt, str) and len(txt) > 0


def test_special_token_positions(tiny_pipe):
    rng = np.random.default_rng(3)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    emb, special = tiny_pipe.encode_prompt_edit("shift the box", edit)
    assert emb.ndim == 2 and emb.shape[1] == 64
    assert special is not None and special.shape == (64,)


@pytest.mark.slow
def test_multi_image_edit(tiny_pipe):
    rng = np.random.default_rng(5)
    imgs = [Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            for _ in range(2)]
    out = tiny_pipe("merge the scenes", edit_image=imgs, height=64, width=64,
                    seed=2, num_inference_steps=2, have_text_reasoning=False,
                    edit_image_auto_resize=False)
    assert out.size == (64, 64)


def test_context_image(tiny_pipe):
    rng = np.random.default_rng(6)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    out = tiny_pipe("apply the style", edit_image=edit, context_image=ctx,
                    height=64, width=64, seed=3, num_inference_steps=2,
                    have_text_reasoning=False, edit_image_auto_resize=False)
    assert out.size == (64, 64)


def test_inpaint_preserves_unmasked_region(tiny_pipe):
    rng = np.random.default_rng(7)
    base = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    mask_arr = np.zeros((64, 64), np.uint8)
    mask_arr[:32, :32] = 255  # repaint only the top-left quadrant
    mask = Image.fromarray(mask_arr)
    out = tiny_pipe("repaint the corner", input_image=base, inpaint_mask=mask,
                    height=64, width=64, seed=9, num_inference_steps=3,
                    have_text_reasoning=False)
    assert out.size == (64, 64)
    out_a = np.asarray(out, np.float32)
    base_a = np.asarray(base, np.float32)
    # Unmasked region should reconstruct the input far better than the
    # repainted region differs (VAE roundtrip is lossy, so compare deltas).
    masked_delta = np.abs(out_a[:32, :32] - base_a[:32, :32]).mean()
    kept_delta = np.abs(out_a[32:, 32:] - base_a[32:, 32:]).mean()
    assert np.isfinite(out_a).all()
    assert kept_delta < masked_delta * 1.5 + 40  # loose sanity on random weights


@pytest.mark.slow
def test_edit_rope_interpolation_path(tiny_pipe):
    rng = np.random.default_rng(8)
    edit = Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    out = tiny_pipe("shift it", edit_image=edit, height=64, width=64, seed=4,
                    num_inference_steps=2, have_text_reasoning=False,
                    edit_image_auto_resize=False, edit_rope_interpolation=True)
    assert out.size == (64, 64)


def test_txt_bucketing_bounds_compiles(tiny_pipe):
    """Different prompt lengths in the same bucket produce the same padded
    text length (so the denoise program is reused)."""
    captured = []
    from physicedit_tpu.pipeline import edit_pipeline as EP

    orig = EP.denoise

    def spy(*args, **kw):
        captured.append(args[4].shape)  # prompt_emb
        return orig(*args, **kw)

    EP.denoise = spy
    try:
        rng = np.random.default_rng(9)
        edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        kw = dict(edit_image=edit, height=64, width=64, seed=1,
                  num_inference_steps=1, have_text_reasoning=False,
                  edit_image_auto_resize=False)
        tiny_pipe("move the red box", **kw)
        tiny_pipe("tilt the big cup", **kw)  # same token count -> same bucket
    finally:
        EP.denoise = orig
    assert captured[0] == captured[1]
    assert captured[0][1] % tiny_pipe.txt_len_bucket == 0


@pytest.mark.slow
def test_edit_batch_matches_single_edits(tiny_pipe):
    """Batched serving: N same-bucket edits in one denoise invocation
    reproduce the single-edit outputs (same per-item seed/noise)."""
    rng = np.random.default_rng(11)
    ims = [Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
           for _ in range(2)]
    prompts = ["move the red box", "tilt the big cup"]
    singles = [np.asarray(tiny_pipe(
        p, edit_image=im, height=64, width=64, seed=s,
        num_inference_steps=2, have_text_reasoning=False,
        edit_image_auto_resize=False))
        for p, im, s in zip(prompts, ims, [5, 9])]
    batched = tiny_pipe.edit_batch(
        prompts, ims, height=64, width=64, seeds=[5, 9],
        num_inference_steps=2, have_text_reasoning=False)
    for one, many in zip(singles, batched):
        diff = np.abs(one.astype(np.int16) - np.asarray(many).astype(np.int16))
        assert diff.max() <= 1, diff.max()  # fp reassociation tolerance


def test_edit_batch_mixed_shapes_and_order(tiny_pipe):
    """Mixed-resolution serving smoke: one conditioning batch over items
    of different native sizes; outputs come back at each item's own size
    and in input order."""
    rng = np.random.default_rng(12)
    sizes = [(64, 64), (96, 64), (64, 64)]   # (w, h); two shape groups
    ims = [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
           for w, h in sizes]
    outs = tiny_pipe.edit_batch_mixed(
        ["a", "b", "c"], ims, seeds=[1, 2, 3], num_inference_steps=1,
        have_text_reasoning=False)
    assert [o.size for o in outs] == sizes
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()


@pytest.mark.slow
def test_edit_batch_mixed_matches_single_edits(tiny_pipe):
    """Mixed-res serving parity: per-item outputs equal the single-edit
    path (same seeds) even though conditioning batched across two
    resolution groups."""
    rng = np.random.default_rng(13)
    sizes = [(64, 64), (96, 64)]
    ims = [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
           for w, h in sizes]
    prompts = ["push the cart", "bend the rod"]
    singles = [np.asarray(tiny_pipe(
        p, edit_image=im, height=h, width=w, seed=s,
        num_inference_steps=2, have_text_reasoning=False,
        edit_image_auto_resize=False))
        for p, im, (w, h), s in zip(prompts, ims, sizes, [5, 9])]
    mixed = tiny_pipe.edit_batch_mixed(
        prompts, ims, seeds=[5, 9], num_inference_steps=2,
        have_text_reasoning=False)
    for one, many in zip(singles, mixed):
        diff = np.abs(one.astype(np.int16) - np.asarray(many).astype(np.int16))
        assert diff.max() <= 1, diff.max()  # fp reassociation tolerance


def test_quantized_pipeline_quality(tiny_pipe):
    """W8A8 / W4A8 DiT end-to-end: quantized edits stay close to fp32
    (quantization noise, not garbage), exercising the quantized dispatch
    through the full denoise scan."""
    from physicedit_tpu.eval.metrics import psnr
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
    from physicedit_tpu.ops.quant import quantize_tree

    rng = np.random.default_rng(21)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    kw = dict(edit_image=edit, height=64, width=64, seed=4,
              num_inference_steps=2, have_text_reasoning=False,
              edit_image_auto_resize=False)
    ref = np.asarray(tiny_pipe("slide the green block", **kw), np.float32)

    orig = tiny_pipe.dit_params
    try:
        tiny_pipe.dit_params = quantize_tree(orig)
        out8 = np.asarray(tiny_pipe("slide the green block", **kw), np.float32)
        tiny_pipe.dit_params = quantize_tree_int4(orig)
        out4 = np.asarray(tiny_pipe("slide the green block", **kw), np.float32)
    finally:
        tiny_pipe.dit_params = orig

    p8, p4 = psnr(ref, out8), psnr(ref, out4)
    # random tiny weights are the worst case for quantization; the bound
    # asserts "quantization noise" rather than a broken kernel
    assert p8 > 20.0, p8
    assert p4 > 13.0, p4
    assert p8 >= p4 - 1.0  # int8 should not be worse than int4


def test_reasoner_batch_matches_single(tiny_pipe):
    """Batched reasoning (one prefill+decode for N items) reproduces the
    per-item results, including mixed prompt lengths in one bucket."""
    rng = np.random.default_rng(31)
    ims = [Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
           for _ in range(2)]
    prompts = ["tilt the cup", "slide the very big red box to the left side"]
    singles = [tiny_pipe.reason_physical(p, im, max_new_tokens=5)
               for p, im in zip(prompts, ims)]
    # reason_physical delegates to the batch path with one row; check a
    # true multi-row call agrees with the row-at-a-time results
    batched = tiny_pipe.reason_physical_batch(prompts, ims, max_new_tokens=5)
    assert batched == singles


def test_shard_rejects_quantized_pipeline(tiny_pipe):
    """Quantized residency and mesh sharding are alternative memory
    strategies: shard() must fail with a clear error, not a KeyError deep
    in the partition specs."""
    import jax
    import pytest
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4
    from physicedit_tpu.parallel import sharding as shd

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    orig = tiny_pipe.dit_params
    try:
        tiny_pipe.dit_params = quantize_tree_int4(orig, min_size=1)
        with pytest.raises(ValueError, match="alternative memory"):
            tiny_pipe.shard(shd.create_mesh(2, 4))
    finally:
        tiny_pipe.dit_params = orig
        tiny_pipe.mesh = None


def test_reference_api_compat_kwargs(tiny_pipe):
    """The reference __call__ accepts tiled/rand_device/fp8/progress-bar
    kwargs (qwen_image_physical.py:545-597); ours must too (no-ops),
    and reject the modes that genuinely do not exist here."""
    import numpy as np
    import pytest
    from PIL import Image

    rng = np.random.default_rng(0)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out = tiny_pipe("nudge the cup", edit_image=edit, height=64, width=64,
                    seed=5, num_inference_steps=1, have_text_reasoning=False,
                    edit_image_auto_resize=False,
                    tiled=True, tile_size=64, tile_stride=32,
                    rand_device="cpu", enable_fp8_attention=True,
                    progress_bar_cmd=lambda x: x)
    assert out.size == (64, 64)
    with pytest.raises(ValueError, match="rand_device"):
        tiny_pipe("x", edit_image=edit, height=64, width=64,
                  num_inference_steps=1, have_text_reasoning=False,
                  edit_image_auto_resize=False, rand_device="cuda")
    with pytest.raises(NotImplementedError, match="Trainer.preprocess"):
        tiny_pipe("x", edit_image=edit, height=64, width=64,
                  num_inference_steps=1, have_text_reasoning=False,
                  edit_image_auto_resize=False, is_train=True)
