"""Tiny random-weight pipeline factory for tests and the driver dryrun.

The reference has no automated tests (SURVEY.md section 4); this factory
builds a full PhysicEditPipeline over tiny random models with a fake
deterministic tokenizer, so end-to-end behaviour (VAE encode -> VL prompt
encode with special tokens -> CFG denoise scan with per-step token rewrite
-> VAE decode, plus edit_batch serving and mesh sharding) is drivable
without checkpoints — by tests/test_pipeline_e2e.py and by
__graft_entry__.dryrun_multichip's serve_batch lane alike.
"""

import re
import zlib

import jax
import jax.numpy as jnp

from physicedit_tpu.models import dit as m_dit
from physicedit_tpu.models import qwen_vl as m_text
from physicedit_tpu.models import qwen_vl_vision as m_vis
from physicedit_tpu.models import vae as m_vae
from physicedit_tpu.models import adapters as m_ad
from physicedit_tpu.models.vae_init import init_vae_params
from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline


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
        # Word ids live in [300, 450) — disjoint from the special-token
        # ids.  crc32, not hash(): Python's string hash is salted per
        # process, which would break cross-process determinism (golden
        # capture vs compare, multihost workers tokenizing one prompt).
        return [300 + (zlib.crc32(w.encode()) % 150) for w in chunk.split()]

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
