"""Trainer E2E smoke: preprocess -> train step -> loss decreases -> save/resume."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from physicedit_tpu.train.trainer import TrainConfig, Trainer
from tests.test_pipeline_e2e import build_tiny_pipeline


class SyntheticDataset:
    """Three fake 'video' samples: frames are flat-colour PIL images."""

    def __init__(self, n=3):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i % self.n)

        def img():
            return Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

        return {
            "image": img(),
            "edit_image": img(),
            "middle_key_frames": [img() for _ in range(3)],
            "prompt": f"sample {i} physical edit",
            "triplet": {"middle_transition_prompt": "it moves",
                        "final_state_prompt": "it moved"},
            "supported_rules": [], "contradicted_rules": [],
        }


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    pipe = build_tiny_pipeline()
    # tiny DINOv2 for the prior branch
    import jax
    from physicedit_tpu.models import dinov2 as m_dino
    from physicedit_tpu.io.convert import dinov2_from_torch
    import torch
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(0)
    hf = Dinov2WithRegistersModel(Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        patch_size=14, num_register_tokens=4)).eval()
    pipe.dinov2_params = dinov2_from_torch(hf.state_dict(), dtype=jnp.float32)
    pipe.dinov2_cfg = m_dino.DinoV2Config(hidden_size=32, num_layers=1, num_heads=2)

    cfg = TrainConfig(
        output_path=str(tmp_path_factory.mktemp("ckpt")),
        learning_rate=1e-3, num_epochs=1, lora_rank=2,
        save_every_n_steps=0, height=64, width=64, txt_len_bucket=64)
    t = Trainer(pipe, SyntheticDataset(), cfg)
    # shrink the trainable surface to the tiny dims
    from physicedit_tpu.train.trainer import init_trainable

    return t


@pytest.mark.slow
def test_preprocess_and_steps(trainer):
    from physicedit_tpu.train.train_step import train_step

    batch = trainer.preprocess(trainer.dataset[0])
    assert batch is not None
    assert batch["prompt_emb"].shape[0] == 1
    assert batch["special_idx"].shape == (1, 64)
    assert batch["dino_mid_feats"].shape[0] == 1

    frozen = {"dit": trainer.pipe.dit_params}
    losses = []
    for _ in range(3):
        trainer.trainable, trainer.opt_state, metrics = train_step(
            trainer.trainable, frozen, trainer.opt_state, batch,
            trainer.pipe.dit_cfg, trainer.optimizer,
            trainer.t_min, trainer.t_max, use_remat=False)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch -> loss must drop


@pytest.mark.slow
def test_save_and_resume(trainer, tmp_path):
    trainer.global_step = 11
    path = trainer.save(epoch=0)
    import os

    assert os.path.exists(path)

    pipe2 = trainer.pipe
    cfg2 = TrainConfig(output_path=str(tmp_path), lora_rank=2,
                       height=64, width=64, txt_len_bucket=64)
    t2 = Trainer(pipe2, trainer.dataset, cfg2)
    t2.resume(trainer.cfg.output_path)
    assert t2.global_step == 11
    np.testing.assert_allclose(
        np.asarray(t2.trainable["lora"]["to_out"]["A"]),
        np.asarray(trainer.trainable["lora"]["to_out"]["A"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t2.trainable["adapters"]["dino_time_embed"]),
        np.asarray(trainer.trainable["adapters"]["dino_time_embed"]), rtol=1e-6)


@pytest.mark.slow
def test_eval_probe(trainer):
    strip = trainer.evaluate(0, num_inference_steps=2)
    assert strip is not None
    assert strip.size == (64 * 3, 64)


def test_gradient_accumulation_delays_updates():
    import jax
    import jax.numpy as jnp

    from physicedit_tpu.train.train_step import make_optimizer

    opt = make_optimizer(lr=0.1, gradient_accumulation_steps=3)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    g = {"w": jnp.ones((4,))}
    p = params
    snapshots = []
    for _ in range(3):
        updates, state = opt.update(g, state, p)
        import optax

        p = optax.apply_updates(p, updates)
        snapshots.append(np.asarray(p["w"]).copy())
    # first two micro-steps are no-ops; the third applies the averaged grad
    np.testing.assert_array_equal(snapshots[0], np.ones(4))
    np.testing.assert_array_equal(snapshots[1], np.ones(4))
    assert (snapshots[2] < 1.0).all()


@pytest.mark.slow
def test_compute_visual_priors_standalone(trainer):
    """The pipeline-level prior extractor (inference-style API) runs and
    produces [1, 64, D] deltas for both branches."""
    from physicedit_tpu.pipeline.visual_prior import compute_visual_priors

    sample = trainer.dataset[0]
    adapters = trainer.trainable["adapters"]
    pd, pv = compute_visual_priors(
        adapters, trainer.pipe.dinov2_params, trainer.pipe.dinov2_cfg,
        trainer.pipe.vae_params, trainer.pipe.vae_cfg,
        sample["middle_key_frames"], sample["edit_image"],
        np.random.default_rng(0))
    assert pd.shape == (1, 64, trainer.pipe.dit_cfg.txt_in_dim)
    assert pv.shape == (1, 64, trainer.pipe.dit_cfg.txt_in_dim)
    assert np.isfinite(np.asarray(pd)).all() and np.isfinite(np.asarray(pv)).all()


def test_collate_pads_text_axis(trainer):
    b1 = trainer.preprocess(trainer.dataset[0])
    b2 = trainer.preprocess(trainer.dataset[1])
    assert b1 is not None and b2 is not None
    batch = trainer.collate([b1, b2])
    assert batch["input_latents"].shape[0] == 2
    assert batch["prompt_emb"].shape[0] == 2
    assert batch["txt_mask"].shape == batch["prompt_emb"].shape[:2]
    assert batch["txt_cos"].shape[0] == batch["prompt_emb"].shape[1]


@pytest.mark.slow
def test_per_sample_loss_weighting(trainer):
    """Each sample's bell weight scales ITS OWN error (reference
    training_loss, qwen_image_physical.py:324-328) — the batched loss must
    equal the mean of the single-sample losses, which mean(weight)*mean(mse)
    does not satisfy for mixed-timestep batches."""
    from physicedit_tpu.train.loss import physic_training_loss

    b1 = trainer.preprocess(trainer.dataset[0])
    b2 = trainer.preprocess(trainer.dataset[1])
    # force very different weights so the old formula visibly diverges
    b1 = dict(b1, weight=np.asarray([5.0], np.float32))
    b2 = dict(b2, weight=np.asarray([0.1], np.float32))
    frozen = {"dit": trainer.pipe.dit_params}

    def loss_of(batch):
        l, _ = physic_training_loss(
            trainer.trainable, frozen, trainer.pipe.dit_cfg, batch,
            trainer.t_min, trainer.t_max)
        return float(l)

    batched = loss_of(trainer.collate([b1, b2]))
    singles = 0.5 * (loss_of(trainer.collate([b1]))
                     + loss_of(trainer.collate([b2])))
    np.testing.assert_allclose(batched, singles, rtol=2e-3)


@pytest.mark.slow
def test_data_parallel_training_step(trainer):
    """One train step on a (2, 4) mesh with a collated global batch of 2."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from physicedit_tpu.parallel import sharding as shd
    from physicedit_tpu.train.trainer import TrainConfig, Trainer

    mesh = shd.create_mesh(2, 4)
    cfg = TrainConfig(output_path=trainer.cfg.output_path, lora_rank=2,
                      height=64, width=64, txt_len_bucket=64, batch_size=2,
                      use_remat=False)
    t2 = Trainer(trainer.pipe, trainer.dataset, cfg, mesh=mesh)
    b1 = t2.preprocess(t2.dataset[0])
    b2 = t2.preprocess(t2.dataset[1])
    batch = t2._place_batch(t2.collate([b1, b2]))
    from physicedit_tpu.train.train_step import train_step

    t2.trainable, t2.opt_state, metrics = train_step(
        t2.trainable, t2.frozen, t2.opt_state, batch, t2.pipe.dit_cfg,
        t2.optimizer, t2.t_min, t2.t_max, use_remat=False)
    assert np.isfinite(float(metrics["loss"]))


def test_direct_distill_loss(trainer):
    import jax.numpy as jnp

    from physicedit_tpu.ops import rope as m_rope
    from physicedit_tpu.sampling import flow_match as fm
    from physicedit_tpu.train.loss import direct_distill_loss

    pipe = trainer.pipe
    rng = np.random.default_rng(0)
    h = w = 8
    s_t = 6
    latents0 = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, h, w, 16)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(1, s_t, 64)).astype(np.float32))
    ropes = list(map(jnp.asarray, m_rope.build_rope_tables(
        [(1, h // 2, w // 2)], s_t, axes_dim=pipe.rope_axes)))
    sched = fm.build_schedule(2, fm.QWEN_IMAGE_CONFIG, dynamic_shift_len=16)
    loss = direct_distill_loss(pipe.dit_params, pipe.dit_cfg, latents0, None,
                               emb, jnp.ones((1, s_t), bool), ropes, sched,
                               target)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_train_step_with_w4_frozen_dit(trainer, monkeypatch):
    """Single-chip training path: frozen DiT in packed int4, LoRA trains
    through the straight-through custom VJP (kernels/quant_matmul.py)."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from physicedit_tpu.kernels.quant_matmul import quantize_tree_int4

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))

    t = trainer
    batch = t.collate([t.preprocess(t.dataset[i]) for i in (0, 1)])
    frozen_q = {"dit": quantize_tree_int4(t.frozen["dit"], min_size=1 << 10)}
    from physicedit_tpu.train.train_step import make_optimizer, train_step
    from physicedit_tpu.train.trainer import init_trainable
    from physicedit_tpu.sampling import flow_match as fm

    # fresh trainables: earlier tests' train_step calls DONATE the
    # fixture's buffers
    trainable = init_trainable(t.pipe, t.cfg)
    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(trainable)
    t_min, t_max = fm.adapter_t_range()
    tr, _, metrics = train_step(
        trainable, frozen_q, opt_state, batch, t.pipe.dit_cfg, optimizer,
        t_min, t_max, use_remat=True)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # LoRA B starts at 0 and must move after one step
    leaf = jax.tree_util.tree_leaves(tr["lora"])[-1]
    assert float(np.abs(np.asarray(leaf)).max()) > 0


@pytest.mark.slow
def test_trainer_quantize_frozen_config():
    pipe = build_tiny_pipeline()
    cfg = TrainConfig(output_path="/tmp/x", lora_rank=2, height=64, width=64,
                      txt_len_bucket=64, quantize_frozen="w4",
                      quantize_min_size=1 << 10)
    t = Trainer(pipe, SyntheticDataset(), cfg)
    leaves = {k for k in t.frozen["dit"]["blocks"]["attn"]["img_qkv"]}
    assert "w4" in leaves and "w" not in leaves
    with pytest.raises(ValueError):
        Trainer(pipe, SyntheticDataset(),
                TrainConfig(output_path="/tmp/x", quantize_frozen="fp8"))


def test_cache_preprocessed_roundtrip(trainer, tmp_path):
    """Data-process mode: preprocess once -> npz cache -> train from cache
    produces the same collated batch as inline preprocessing."""
    from physicedit_tpu.train.dataset import CachedPreprocessedDataset

    t = trainer
    n = t.cache_preprocessed(str(tmp_path / "cache"))
    assert n == len(t.dataset)
    cached = CachedPreprocessedDataset(str(tmp_path / "cache"))
    assert len(cached) == n
    inline = t.collate([t.preprocess(t.dataset[i]) for i in (0, 1)])
    from_cache = t.collate([t._refresh_noise(cached[0]),
                            t._refresh_noise(cached[1])])
    assert set(inline) == set(from_cache)
    # prior-branch features use augmentation randomness at preprocess
    # time; the cache freezes one draw (encoder outputs), noise/timestep
    # are redrawn per visit
    stochastic = {"noise", "sigma", "timestep", "weight",
                  "dino_mid_feats", "dino_src_feats",
                  "vae_mid_tokens", "vae_src_tokens"}
    for k in inline:
        if k in stochastic:  # redrawn per visit by design
            assert np.asarray(from_cache[k]).shape == np.asarray(inline[k]).shape
            continue
        np.testing.assert_allclose(np.asarray(inline[k], np.float32),
                                   np.asarray(from_cache[k], np.float32),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_batch_size_exceeding_usable_samples_raises_clearly(trainer, tmp_path):
    cfg = TrainConfig(output_path=str(tmp_path), lora_rank=2, num_epochs=1,
                      height=64, width=64, txt_len_bucket=64, batch_size=8)
    t = Trainer(trainer.pipe, trainer.dataset, cfg)  # 3 usable samples
    with pytest.raises(RuntimeError, match="batch_size=8 exceeds"):
        t.train()


def test_resume_uses_exact_sample_index(trainer, tmp_path):
    """Mid-epoch saves record the dataset position; resume lands exactly
    there instead of the steps-per-epoch heuristic (which drifts when
    samples are skipped or a partial batch is pending)."""
    cfg2 = TrainConfig(output_path=str(tmp_path), lora_rank=2,
                       height=64, width=64, txt_len_bucket=64)
    t = Trainer(trainer.pipe, trainer.dataset, cfg2)
    t.global_step = 7
    t._epoch_pos = 2        # two dataset indices consumed in epoch 0
    t.save(epoch=0)
    t2 = Trainer(trainer.pipe, trainer.dataset, cfg2)
    t2.resume(str(tmp_path))
    assert (t2.global_step, t2.start_epoch, t2.skip_batches) == (7, 0, 2)

    # epoch fully consumed -> resume rolls to the next epoch
    t.global_step = 9
    t._epoch_pos = len(trainer.dataset)
    t.save(epoch=0)
    t3 = Trainer(trainer.pipe, trainer.dataset, cfg2)
    t3.resume(str(tmp_path))
    assert (t3.global_step, t3.start_epoch, t3.skip_batches) == (9, 1, 0)


def test_low_memory_adamw_matches_optax():
    """scale_by_adam_low_memory: fp32 storage == optax.adamw exactly;
    bf16 storage tracks it closely and halves the state bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from physicedit_tpu.train.train_step import make_optimizer

    params = {"a": jnp.asarray(np.linspace(-1, 1, 64), jnp.float32).reshape(8, 8),
              "b": jnp.full((4,), 0.5, jnp.float32)}
    grads_seq = [jax.tree_util.tree_map(
        lambda p, i=i: 0.1 * jnp.cos(p + i), params) for i in range(5)]

    def run(opt):
        p, s = params, opt.init(params)
        for g in grads_seq:
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    ref_p, _ = run(optax.adamw(1e-3, weight_decay=1e-2))
    fp32_p, _ = run(make_optimizer(1e-3, state_dtype=jnp.float32))
    for l1, l2 in zip(jax.tree_util.tree_leaves(ref_p),
                      jax.tree_util.tree_leaves(fp32_p)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-6, atol=1e-7)

    bf16_p, bf16_s = run(make_optimizer(1e-3, state_dtype=jnp.bfloat16))
    for l1, l2 in zip(jax.tree_util.tree_leaves(ref_p),
                      jax.tree_util.tree_leaves(bf16_p)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=2e-3, atol=2e-3)
    mus = jax.tree_util.tree_leaves(bf16_s[0].mu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)
    nus = jax.tree_util.tree_leaves(bf16_s[0].nu)
    assert all(v.dtype == jnp.bfloat16 for v in nus)


def test_adafactor_optimizer_tiny_state_and_descends():
    """make_optimizer(name='adafactor'): the factored second moment keeps
    optimizer state ~free (rows+cols per matrix vs 2x params for AdamW) —
    the one-chip mode for the reference's r=128 surface — and a short
    descent on a quadratic actually reduces the loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from physicedit_tpu.train.train_step import make_optimizer

    # matrix big enough to factor (min_dim_size_to_factor=128)
    target = jnp.asarray(np.random.default_rng(0).normal(size=(256, 192)),
                         jnp.float32)
    params = {"w": jnp.zeros((256, 192), jnp.float32)}

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2)

    opt = make_optimizer(lr=3e-2, name="adafactor")
    state = opt.init(params)

    def nbytes(tree):
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype"))

    # factored state: ~(256+192) floats per matrix, far below 2x params
    assert nbytes(state) < 0.1 * nbytes(params)

    l0 = float(loss_fn(params))
    for _ in range(50):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < 0.5 * l0

    with pytest.raises(ValueError):
        make_optimizer(name="sgd")


def test_pseudo_targets_mask_padded_frames(trainer):
    """Samples with fewer than MAX_KEY_FRAMES key frames: the zero-padded
    ghost frames must be excluded from the resampler keys (mid_frame_mask),
    so the fixed-shape padded batch produces the SAME pseudo targets as an
    unpadded computation on the real frames only (what the reference's
    dynamic-shape torch path does)."""
    from physicedit_tpu.train.loss import compute_pseudo_targets
    from physicedit_tpu.train.trainer import init_trainable

    batch = trainer.preprocess(SyntheticDataset()[0])
    fmask = np.asarray(batch["mid_frame_mask"])[0]
    f = int(fmask.sum())
    assert f == 3 and fmask.shape[0] == 6  # the pad path is exercised

    trainable = init_trainable(trainer.pipe, trainer.cfg)
    adapters = trainable["adapters"]

    gt_dino_pad, gt_vae_pad = compute_pseudo_targets(adapters, batch)

    unpadded = dict(batch)
    unpadded["dino_mid_feats"] = batch["dino_mid_feats"][:, :f]
    unpadded["vae_mid_tokens"] = batch["vae_mid_tokens"][:, :f]
    del unpadded["mid_frame_mask"]
    gt_dino_ref, gt_vae_ref = compute_pseudo_targets(adapters, unpadded)

    np.testing.assert_allclose(np.asarray(gt_dino_pad),
                               np.asarray(gt_dino_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt_vae_pad),
                               np.asarray(gt_vae_ref), rtol=1e-4, atol=1e-4)
