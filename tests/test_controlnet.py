"""Blockwise ControlNet parity + integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.models import controlnet as jcn
from tests.conftest import requires_reference, load_ref_module


@requires_reference
def test_control_block_parity():
    import torch

    ref_mod = load_ref_module("models.qwen_image_controlnet")
    torch.manual_seed(0)
    ref = ref_mod.QwenImageBlockWiseControlNet(num_layers=2, in_dim=64,
                                               dim=96).eval()
    params = jcn.controlnet_from_torch(ref.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    cond_tokens = rng.normal(size=(1, 12, 64)).astype(np.float32)
    img = rng.normal(size=(1, 12, 96)).astype(np.float32)
    with torch.no_grad():
        cond_ref = ref.process_controlnet_conditioning(torch.tensor(cond_tokens))
        out_ref = ref.blockwise_forward(torch.tensor(img), cond_ref, 1)

    cond = jcn.process_conditioning(params, jnp.asarray(cond_tokens))
    np.testing.assert_allclose(np.asarray(cond), cond_ref.numpy(), rtol=1e-4, atol=1e-5)
    blk = jax.tree_util.tree_map(lambda x: x[1], params["blocks"])
    out = jcn.control_block(blk, jnp.asarray(img), cond)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-4)


def test_step_scales_gate():
    s = jcn.controlnet_step_scales(5, start=1.0, end=0.5, scale=2.0)
    # progress = [1, .75, .5, .25, 0] -> active for first three steps
    np.testing.assert_allclose(s, [2.0, 2.0, 2.0, 0.0, 0.0])


@pytest.mark.slow
def test_denoise_with_controlnet_runs():
    from physicedit_tpu.models import dit as jdit
    from physicedit_tpu.ops import rope as jrope
    from physicedit_tpu.sampling import flow_match as fm
    from physicedit_tpu.sampling.denoise import denoise

    cfg = jdit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                         txt_in_dim=48, patch_dim=64, time_dim=32)
    params = jdit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    cn = jcn.init_controlnet_params(jax.random.PRNGKey(1), num_layers=2,
                                    dim=cfg.dim)
    h = w = 8
    s_t = 6
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    cond_lat = jnp.asarray(rng.normal(size=(1, 16, 64)).astype(np.float32))
    cond = jcn.process_conditioning(cn, cond_lat)
    prompt_emb = jnp.asarray(rng.normal(size=(1, s_t, 48)).astype(np.float32))
    ropes = jrope.build_rope_tables([(1, 4, 4)], s_t, axes_dim=(8, 12, 12))
    sched = fm.build_schedule(3, fm.QWEN_IMAGE_CONFIG, dynamic_shift_len=16)
    scales = jcn.controlnet_step_scales(3)

    out = denoise(params, cfg, latents, None, prompt_emb,
                  jnp.ones((1, s_t), bool), *map(jnp.asarray, ropes),
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(1.0),
                  latent_hw=(h, w),
                  control_blocks=cn["blocks"], control_cond=cond,
                  control_scales=jnp.asarray(scales))
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output_proj => identical to the no-controlnet path
    base = denoise(params, cfg, latents, None, prompt_emb,
                   jnp.ones((1, s_t), bool), *map(jnp.asarray, ropes),
                   jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                   jnp.asarray(sched.timesteps), jnp.asarray(1.0),
                   latent_hw=(h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


@pytest.mark.slow
def test_pipeline_with_blockwise_controlnet():
    from PIL import Image

    from tests.test_pipeline_e2e import build_tiny_pipeline

    pipe = build_tiny_pipeline()
    pipe.controlnet_params = jcn.init_controlnet_params(
        jax.random.PRNGKey(9), num_layers=pipe.dit_cfg.num_layers,
        dim=pipe.dit_cfg.dim, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    edit = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctl = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    kw = dict(edit_image=edit, height=64, width=64, seed=2,
              num_inference_steps=2, have_text_reasoning=False,
              edit_image_auto_resize=False)
    out_ctl = np.asarray(pipe("guide it", blockwise_controlnet_image=ctl, **kw))
    # zero-init output projections -> identical to the uncontrolled edit
    out_base = np.asarray(pipe("guide it", **kw))
    np.testing.assert_array_equal(out_ctl, out_base)
