"""Denoise-scan semantics: scan output == explicit python step loop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.models import dit as jdit
from physicedit_tpu.models import adapters as jad
from physicedit_tpu.ops import rope as jrope
from physicedit_tpu.ops.patchify import patchify, unpatchify
from physicedit_tpu.sampling import flow_match as fm
from physicedit_tpu.sampling.denoise import denoise, _rewrite_special_tokens


def _setup():
    cfg = jdit.TINY_CONFIG
    key = jax.random.PRNGKey(0)
    dit_params = jdit.init_dit_params(key, cfg, jnp.float32)
    adapter_params = jad.init_dual_adapter_params(
        jax.random.PRNGKey(1), cfg.txt_in_dim, cfg.txt_in_dim)
    h = w = 8  # latent grid
    s_t = 12
    n_special = 4
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    edit_tokens = jnp.asarray(rng.normal(size=(1, 16, 64)).astype(np.float32))
    prompt_emb = jnp.asarray(rng.normal(size=(2, s_t, cfg.txt_in_dim)).astype(np.float32))
    txt_mask = jnp.asarray(np.array([[1] * 12, [1] * 8 + [0] * 4]), bool)
    special_idx = jnp.asarray(np.array([[5, 6, 7, 8], [3, 4, 5, 6]]), jnp.int32)
    ropes = jrope.build_rope_tables([(1, h // 2, w // 2), (1, h // 2, w // 2)],
                                    s_t, axes_dim=(16, 24, 24))
    sched = fm.build_schedule(5, fm.QWEN_IMAGE_CONFIG, dynamic_shift_len=(h // 2) ** 2)
    return cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb, \
        txt_mask, special_idx, ropes, sched, (h, w)


@pytest.mark.slow
def test_denoise_matches_python_loop():
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    t_min, t_max = 20.0, 1000.0
    cfg_scale = 4.0

    out = denoise(dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
                  img_cos, img_sin, txt_cos, txt_sin,
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(cfg_scale),
                  latent_hw=(h, w), adapter_params=adapter_params,
                  special_idx=special_idx, t_min=t_min, t_max=t_max)

    # Explicit python loop with the same primitives.
    lat = latents
    p_emb = prompt_emb
    for i in range(sched.num_steps):
        t = jnp.asarray(sched.timesteps[i])
        p_emb = _rewrite_special_tokens(adapter_params, p_emb, special_idx,
                                        jnp.broadcast_to(t, (2,)), t_min, t_max)
        toks = jnp.concatenate([patchify(lat), edit_tokens], axis=1)
        toks = jnp.broadcast_to(toks, (2,) + toks.shape[1:])
        o = jdit.dit_forward(dit_params, cfg, toks, p_emb,
                             jnp.broadcast_to(t / 1000.0, (2,)),
                             img_cos, img_sin, txt_cos, txt_sin,
                             txt_key_mask=txt_mask)
        v = unpatchify(o[:, : (h // 2) * (w // 2)], h, w)
        v = v[1:] + cfg_scale * (v[:1] - v[1:])
        lat = lat + v * (sched.sigmas_next[i] - sched.sigmas[i])

    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_no_cfg_no_adapter():
    (cfg, dit_params, _, latents, _, prompt_emb, txt_mask, _, ropes,
     sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    # Single prompt, no edit tokens, no adapter: rope table must only cover
    # the base image grid.
    ropes1 = jrope.build_rope_tables([(1, h // 2, w // 2)], prompt_emb.shape[1],
                                     axes_dim=(16, 24, 24))
    out = denoise(dit_params, cfg, latents, None, prompt_emb[:1], txt_mask[:1],
                  ropes1[0], ropes1[1], ropes1[2], ropes1[3],
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(1.0),
                  latent_hw=(h, w))
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_inpaint_full_protect_recovers_input():
    """With the repaint mask all-zero, the implied velocity (eps - x0) is
    exact, so the Euler trajectory must land back on the clean latents."""
    (cfg, dit_params, _, latents, edit_tokens, prompt_emb, txt_mask, _,
     ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    start = (1.0 - sched.sigmas[0]) * x0 + sched.sigmas[0] * noise

    out = denoise(dit_params, cfg, start, edit_tokens, prompt_emb, txt_mask,
                  img_cos, img_sin, txt_cos, txt_sin,
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(4.0),
                  latent_hw=(h, w),
                  inpaint_mask=jnp.zeros((1, h, w, 1), jnp.float32),
                  input_latents=x0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow  # heavy e2e; fast siblings cover the module
def test_cfg_truncate_matches_python_loop():
    """cfg_truncate_after=k: steps [0,k) full CFG, steps [k,T) positive
    rows only — pinned against an explicit python loop (the opt-in
    CFG-interval serving accelerator; default None is reference-exact)."""
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    t_min, t_max = 20.0, 1000.0
    cfg_scale, k = 4.0, 2

    out = denoise(dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
                  img_cos, img_sin, txt_cos, txt_sin,
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(cfg_scale),
                  latent_hw=(h, w), adapter_params=adapter_params,
                  special_idx=special_idx, t_min=t_min, t_max=t_max,
                  cfg_truncate_after=k)

    lat = latents
    p_emb = prompt_emb
    for i in range(sched.num_steps):
        rows = 2 if i < k else 1
        t = jnp.asarray(sched.timesteps[i])
        p_emb = _rewrite_special_tokens(
            adapter_params, p_emb[:rows], special_idx[:rows],
            jnp.broadcast_to(t, (rows,)), t_min, t_max)
        toks = jnp.concatenate([patchify(lat), edit_tokens], axis=1)
        toks = jnp.broadcast_to(toks, (rows,) + toks.shape[1:])
        o = jdit.dit_forward(dit_params, cfg, toks, p_emb[:rows],
                             jnp.broadcast_to(t / 1000.0, (rows,)),
                             img_cos, img_sin, txt_cos, txt_sin,
                             txt_key_mask=txt_mask[:rows])
        v = unpatchify(o[:, : (h // 2) * (w // 2)], h, w)
        if rows == 2:
            v = v[1:] + cfg_scale * (v[:1] - v[1:])
        lat = lat + v * (sched.sigmas_next[i] - sched.sigmas[i])

    np.testing.assert_allclose(np.asarray(out), np.asarray(lat),
                               rtol=2e-4, atol=2e-4)


def test_cfg_truncate_disabled_is_bit_identical():
    """k >= num_steps (or None) must take the single-scan path and equal
    the default bit-for-bit."""
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes

    def run(**kw):
        return np.asarray(denoise(
            dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
            img_cos, img_sin, txt_cos, txt_sin,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
            jnp.asarray(sched.timesteps), jnp.asarray(4.0),
            latent_hw=(h, w), adapter_params=adapter_params,
            special_idx=special_idx, t_min=20.0, t_max=1000.0, **kw))

    base = run()
    assert (run(cfg_truncate_after=sched.num_steps) == base).all()
    assert (run(cfg_truncate_after=None) == base).all()


def test_cfg_truncate_slices_per_row_txt_rope():
    """EliGen entity control carries per-CFG-row text rope tables
    [B, 1, s_t, 64] (edit_pipeline.py builds them when entity prompts are
    present).  The positive-only late lane must slice them to its batch —
    regression for a trace-time shape mismatch (batch-2 text queries vs
    batch-1 image queries at the truncation step)."""
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    # Per-row tables: row 0 is the plain table, row 1 gets a distinct
    # (still valid cos/sin) table so a slicing mistake changes the result.
    rng = np.random.default_rng(7)
    phase = rng.uniform(0, 2 * np.pi, size=txt_cos.shape).astype(np.float32)
    txt_cos4 = jnp.asarray(np.stack([np.asarray(txt_cos),
                                     np.cos(phase)])[:, None])
    txt_sin4 = jnp.asarray(np.stack([np.asarray(txt_sin),
                                     np.sin(phase)])[:, None])
    t_min, t_max = 20.0, 1000.0
    cfg_scale, k = 4.0, 2

    out = denoise(dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
                  img_cos, img_sin, txt_cos4, txt_sin4,
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(cfg_scale),
                  latent_hw=(h, w), adapter_params=adapter_params,
                  special_idx=special_idx, t_min=t_min, t_max=t_max,
                  cfg_truncate_after=k)

    lat = latents
    p_emb = prompt_emb
    for i in range(sched.num_steps):
        rows = 2 if i < k else 1
        t = jnp.asarray(sched.timesteps[i])
        p_emb = _rewrite_special_tokens(
            adapter_params, p_emb[:rows], special_idx[:rows],
            jnp.broadcast_to(t, (rows,)), t_min, t_max)
        toks = jnp.concatenate([patchify(lat), edit_tokens], axis=1)
        toks = jnp.broadcast_to(toks, (rows,) + toks.shape[1:])
        o = jdit.dit_forward(dit_params, cfg, toks, p_emb[:rows],
                             jnp.broadcast_to(t / 1000.0, (rows,)),
                             img_cos, img_sin,
                             txt_cos4[:rows], txt_sin4[:rows],
                             txt_key_mask=txt_mask[:rows])
        v = unpatchify(o[:, : (h // 2) * (w // 2)], h, w)
        if rows == 2:
            v = v[1:] + cfg_scale * (v[:1] - v[1:])
        lat = lat + v * (sched.sigmas_next[i] - sched.sigmas[i])

    np.testing.assert_allclose(np.asarray(out), np.asarray(lat),
                               rtol=2e-4, atol=2e-4)


def test_cfg_truncate_negative_raises():
    """k < 0 is a loud error, not a silent no-op (the 0 < k gate used to
    swallow it and run full CFG at every step)."""
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    with pytest.raises(ValueError, match="cfg_truncate_after"):
        denoise(dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
                img_cos, img_sin, txt_cos, txt_sin,
                jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                jnp.asarray(sched.timesteps), jnp.asarray(4.0),
                latent_hw=(h, w), adapter_params=adapter_params,
                special_idx=special_idx, t_min=20.0, t_max=1000.0,
                cfg_truncate_after=-1)


@pytest.mark.slow
def test_cfg_truncate_zero_is_positives_only_throughout():
    """k=0 runs the positive rows from the very first step (the 0 < k gate
    used to silently disable the feature) — pinned against the explicit
    python loop with rows=1 at every step."""
    (cfg, dit_params, adapter_params, latents, edit_tokens, prompt_emb,
     txt_mask, special_idx, ropes, sched, (h, w)) = _setup()
    img_cos, img_sin, txt_cos, txt_sin = ropes
    t_min, t_max = 20.0, 1000.0

    out = denoise(dit_params, cfg, latents, edit_tokens, prompt_emb, txt_mask,
                  img_cos, img_sin, txt_cos, txt_sin,
                  jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                  jnp.asarray(sched.timesteps), jnp.asarray(4.0),
                  latent_hw=(h, w), adapter_params=adapter_params,
                  special_idx=special_idx, t_min=t_min, t_max=t_max,
                  cfg_truncate_after=0)

    lat = latents
    p_emb = prompt_emb
    for i in range(sched.num_steps):
        t = jnp.asarray(sched.timesteps[i])
        p_emb = _rewrite_special_tokens(
            adapter_params, p_emb[:1], special_idx[:1],
            jnp.broadcast_to(t, (1,)), t_min, t_max)
        toks = jnp.concatenate([patchify(lat), edit_tokens], axis=1)
        o = jdit.dit_forward(dit_params, cfg, toks, p_emb[:1],
                             jnp.broadcast_to(t / 1000.0, (1,)),
                             img_cos, img_sin, txt_cos, txt_sin,
                             txt_key_mask=txt_mask[:1])
        v = unpatchify(o[:, : (h // 2) * (w // 2)], h, w)
        lat = lat + v * (sched.sigmas_next[i] - sched.sigmas[i])

    np.testing.assert_allclose(np.asarray(out), np.asarray(lat),
                               rtol=2e-4, atol=2e-4)
