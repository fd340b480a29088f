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


class FakeTokenizer:
    """Deterministic word/special-token tokenizer over a tiny vocab."""

    SPECIALS = {
        "<|image_pad|>": 99, "<|vision_start|>": 98, "<|vision_end|>": 97,
        "<begin_of_img>": 96, "<end_of_img>": 95, "<|im_start|>": 94,
        "<|im_end|>": 93,
    }

    def __init__(self):
        self.specials = dict(self.SPECIALS)
        for i in range(64):
            self.specials[f"<img{i}>"] = 200 + i

    def __call__(self, text):
        pattern = "|".join(re.escape(t) for t in sorted(self.specials, key=len,
                                                        reverse=True))
        ids = []
        pos = 0
        for m in re.finditer(pattern, text):
            ids.extend(self._words(text[pos:m.start()]))
            ids.append(self.specials[m.group(0)])
            pos = m.end()
        ids.extend(self._words(text[pos:]))

        class R:
            input_ids = ids

        return R()

    def _words(self, chunk):
        # Word ids live in [300, 450) — disjoint from the special-token ids.
        return [300 + (hash(w) % 150) for w in chunk.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{i}" for i in ids)

    def convert_tokens_to_ids(self, tok):
        return self.specials[tok]


def build_tiny_pipeline(with_adapter=True):
    dit_cfg = m_dit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                              txt_in_dim=64, patch_dim=64, time_dim=32)
    text_cfg = m_text.TINY_TEXT
    vis_cfg = m_vis.QwenVLVisionConfig(
        depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
        window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64)
    vae_cfg = m_vae.VAEConfig(base_dim=8)

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))
    dit_params = m_dit.init_dit_params(next(ks), dit_cfg, jnp.float32)
    vae_params = init_vae_params(vae_cfg, jnp.float32)

    # random text/vision params via the torch-free init route: reuse HF tiny
    # state dicts is overkill here — build shapes by tracing the converters
    # is complex, so synthesise directly.
    text_params = _rand_text_params(next(ks), text_cfg)
    vision_params = _rand_vision_params(next(ks), vis_cfg)
    adapters = {}
    if with_adapter:
        adapters["visual_thinking_adapter"] = m_ad.init_dual_adapter_params(
            next(ks), 64, 64)

    tok = FakeTokenizer()
    pipe = PhysicEditPipeline(
        dit_params=dit_params, vae_params=vae_params, text_params=text_params,
        vision_params=vision_params, adapters=adapters,
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
        vision_cfg=vis_cfg, tokenizer=tok, dtype=jnp.float32,
        image_pad_id=99, vision_start_id=98, edit_drop_idx=2, t2i_drop_idx=2,
        rope_axes=(8, 12, 12))
    pipe.boi_token_id = 96
    pipe.eoi_token_id = 95
    return pipe


def _rand_text_params(key, cfg):
    ks = jax.random.split(key, 20)
    k = iter(ks)
    from physicedit_tpu.core.params import linear_init

    def layer(kk):
        kks = iter(jax.random.split(kk, 8))
        d, n, kv, hd = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        return {
            "ln1": {"scale": jnp.ones((d,))},
            "q": linear_init(next(kks), d, n * hd),
            "k": linear_init(next(kks), d, kv * hd),
            "v": linear_init(next(kks), d, kv * hd),
            "o": linear_init(next(kks), n * hd, d, bias=False),
            "ln2": {"scale": jnp.ones((d,))},
            "mlp": {
                "gate": linear_init(next(kks), d, cfg.intermediate_size, bias=False),
                "up": linear_init(next(kks), d, cfg.intermediate_size, bias=False),
                "down": linear_init(next(kks), cfg.intermediate_size, d, bias=False),
            },
        }

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[layer(next(k)) for i in range(cfg.num_layers)])
    return {
        "embed": jax.random.normal(next(k), (cfg.vocab_size, cfg.hidden_size)) * 0.02,
        "layers": layers,
        "norm": {"scale": jnp.ones((cfg.hidden_size,))},
        "lm_head": {"w": jax.random.normal(next(k), (cfg.hidden_size, cfg.vocab_size)) * 0.02},
    }


def _rand_vision_params(key, cfg):
    from physicedit_tpu.core.params import linear_init

    k = iter(jax.random.split(key, 12))

    def block(kk):
        kks = iter(jax.random.split(kk, 6))
        d = cfg.hidden_size
        return {
            "norm1": {"scale": jnp.ones((d,))},
            "qkv": linear_init(next(kks), d, 3 * d),
            "proj": linear_init(next(kks), d, d),
            "norm2": {"scale": jnp.ones((d,))},
            "mlp": {
                "gate": linear_init(next(kks), d, cfg.intermediate_size),
                "up": linear_init(next(kks), d, cfg.intermediate_size),
                "down": linear_init(next(kks), cfg.intermediate_size, d),
            },
        }

    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[block(next(k)) for _ in range(cfg.depth)])
    mdim = cfg.hidden_size * cfg.merge_unit
    return {
        "patch_embed": {"w": jax.random.normal(next(k), (3 * 2 * 14 * 14, cfg.hidden_size)) * 0.02},
        "blocks": blocks,
        "merger": {
            "ln_q": {"scale": jnp.ones((cfg.hidden_size,))},
            "fc1": linear_init(next(k), mdim, mdim),
            "fc2": linear_init(next(k), mdim, cfg.out_hidden_size),
        },
    }


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
