"""Checkpoint export/import roundtrip and resume-position math."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physicedit_tpu.models import adapters as m_ad
from physicedit_tpu.models import dit as m_dit
from physicedit_tpu import lora as jlora
from physicedit_tpu.io.convert import physic_adapters_from_state_dict
from physicedit_tpu.io.safetensors_io import load_state_dict
from physicedit_tpu.train import checkpoint as ckpt


def _tiny_trainable():
    cfg = m_dit.DiTConfig(num_layers=2, dim=64, num_heads=2, head_dim=32,
                          txt_in_dim=48)
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 8))
    adapters = {
        "visual_thinking_adapter": m_ad.init_dual_adapter_params(next(keys), 48, 48),
        "dino_resampler": m_ad.init_perceiver_params(
            next(keys), dim=32, num_latents=4, max_num_media_tokens=16),
        "dino_resampler_adapter": m_ad.init_visual_thinking_params(next(keys), 32, 48),
        "dino_time_embed": jax.random.normal(next(keys), (6, 32)),
        "vae_resampler": m_ad.init_perceiver_params(
            next(keys), dim=64, num_latents=4, max_num_media_tokens=16),
        "vae_resampler_adapter": m_ad.init_visual_thinking_params(next(keys), 64, 48),
        "vae_time_embed": jax.random.normal(next(keys), (6, 64)),
    }
    lora = jlora.init_dit_lora(next(keys), cfg, rank=3)
    return cfg, {"lora": lora, "adapters": adapters}


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg, trainable = _tiny_trainable()
    path = ckpt.save_checkpoint(str(tmp_path), trainable, global_step=7,
                                epoch=1, batches_per_epoch=10, use_orbax=False)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(tmp_path, "latest.json"))

    sd = {k: np.asarray(v) for k, v in load_state_dict(path).items()}
    lora_sd, pipe_sd = jlora.split_finetuned_checkpoint(sd)
    back_lora = jlora.import_dit_lora(lora_sd, cfg)
    np.testing.assert_allclose(
        np.asarray(back_lora["to_out"]["A"]),
        np.asarray(trainable["lora"]["to_out"]["A"]), rtol=1e-6)

    back_ad = physic_adapters_from_state_dict(pipe_sd, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back_ad["visual_thinking_adapter"]["head_dino"]["fc1"]["w"]),
        np.asarray(trainable["adapters"]["visual_thinking_adapter"]["head_dino"]["fc1"]["w"]),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back_ad["dino_resampler"]["latents"]),
        np.asarray(trainable["adapters"]["dino_resampler"]["latents"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back_ad["vae_time_embed"]),
        np.asarray(trainable["adapters"]["vae_time_embed"]), rtol=1e-6)


def test_resume_pointer_and_position(tmp_path):
    cfg, trainable = _tiny_trainable()
    ckpt.save_checkpoint(str(tmp_path), trainable, global_step=25, epoch=2,
                         batches_per_epoch=10, use_orbax=False)
    path, meta = ckpt.resolve_resume(str(tmp_path))
    assert path.endswith("step-25.safetensors")
    step, epoch, skip = ckpt.resume_position(meta, num_processes=1,
                                             batches_per_epoch=10)
    assert step == 25 and epoch == 2 and skip == 5

    # World-size change: 25 steps at 2 procs == 50 single-proc batches.
    meta2 = dict(meta, num_processes=2)
    step, epoch, skip = ckpt.resume_position(meta2, num_processes=1,
                                             batches_per_epoch=10)
    assert (epoch, skip) == (5, 0)
