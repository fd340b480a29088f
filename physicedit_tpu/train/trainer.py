"""Training harness: preprocessing + loop + checkpointing + eval.

Rebuilds the reference's custom Accelerate loop
(scripts/train/train_physicedit.py:455-703) on the SPMD train step:

- per-sample preprocessing runs the frozen encoders once (VAE target/edit
  latents, VL prompt embedding with the special-token suffix, DINOv2 and
  VAE raw features for the prior branches) — the analogue of
  forward_preprocess running the pipeline units (train_physicedit.py:255),
- the jitted train_step consumes fixed-shape batches (frames padded to 6,
  prompt embeddings padded to a bucketed length),
- checkpoints every `save_every_n_steps` + at epoch end with JSON metadata
  sidecars and a latest pointer; weights-only resume with step skipping
  (train/checkpoint.py),
- optional periodic fixed-seed eval image generation (rank 0), mirroring
  WandbModelLogger.evaluate_model (train_physicedit.py:39-169).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.models import adapters as m_ad
from physicedit_tpu.models import dinov2 as m_dino
from physicedit_tpu.ops import rope as m_rope
from physicedit_tpu.ops.patchify import patchify
from physicedit_tpu.pipeline import visual_prior
from physicedit_tpu.sampling import flow_match as fm
from physicedit_tpu import lora as jlora
from physicedit_tpu.train import checkpoint as ckpt
from physicedit_tpu.train.train_step import make_optimizer, train_step

MAX_KEY_FRAMES = 6  # nn.Embedding(6, .) in the reference (qwen_image_physical.py:208)


@dataclasses.dataclass
class TrainConfig:
    output_path: str = "./ckpt"
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    num_epochs: int = 5
    lora_rank: int = 128
    save_every_n_steps: int = 500
    eval_every_n_steps: int | None = None
    gradient_accumulation_steps: int = 1
    batch_size: int = 1          # global batch (sharded over the data axis)
    height: int = 480
    width: int = 832
    txt_len_bucket: int = 128   # prompt embeddings padded to multiples of this
    use_remat: bool = True
    seed: int = 0
    # 'none' | 'w4': quantize the FROZEN DiT to packed int4 so the full
    # 20B model trains (LoRA) on one 16 GB chip - the TPU replacement for
    # the reference's single-GPU offload training (train_singlegpu.sh).
    # Gradients flow through the straight-through custom VJP
    # (kernels/quant_matmul.py); trainable params stay full precision.
    quantize_frozen: str = "none"
    quantize_min_size: int = 1 << 16   # leave small layers full precision
    # dataset items are already preprocessed .npz bundles (the reference's
    # cached data-process mode): skip the per-sample frozen-encoder pass
    cached_inputs: bool = False
    # 'float32' (exact optax.adamw) | 'bfloat16': Adam moment storage
    # dtype (train_step.scale_by_adam_low_memory) — halves optimizer-state
    # HBM, the binding constraint for large LoRA ranks on 16 GB chips
    optimizer_state_dtype: str = "float32"
    # LoRA factor dtype ('float32' | 'bfloat16'): bf16 halves the
    # param+grad HBM of the trainable surface
    lora_dtype: str = "float32"
    # 'adamw' (reference optimizer, train_physicedit.py:451-452) |
    # 'adafactor' (factored second moment, ~zero optimizer-state HBM —
    # the one-chip mode for reference-scale r=128)
    optimizer: str = "adamw"
    # adapter (non-LoRA) master-weight dtype: bf16 frees ~1 GB of
    # params+grads — together with adafactor + bf16 factors this is what
    # fits reference-scale r=128 on ONE 16 GB chip (measured,
    # tools/train_singlechip.py); fp32 is the reference-fidelity mode
    adapters_dtype: str = "float32"
    # background threads decoding dataset items ahead of the device (the
    # reference's DataLoader num_workers=8, train_physicedit.py:512);
    # 0 = synchronous
    loader_workers: int = 2


def init_trainable(pipe, cfg: TrainConfig):
    """Fresh trainable surface: LoRA factors + the PhysicEdit adapters.

    Adapter arrays are COPIED from the pipeline: the jitted train_step
    donates trainable buffers, and donating the pipeline's own adapter
    arrays would delete them out from under later pipeline use.
    """
    keys = iter(jax.random.split(jax.random.PRNGKey(cfg.seed), 16))
    adt = getattr(jnp, cfg.adapters_dtype)
    adapters = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True, dtype=adt), dict(pipe.adapters))
    adapters.setdefault("visual_thinking_adapter", m_ad.init_dual_adapter_params(
        next(keys), pipe.dit_cfg.txt_in_dim, pipe.dit_cfg.txt_in_dim,
        dtype=adt))
    adapters.setdefault("dino_resampler", m_ad.init_perceiver_params(
        next(keys), dim=pipe.dinov2_cfg.hidden_size,
        num_latents=m_ad.SPECIAL_TOKEN_NUM, dtype=adt))
    adapters.setdefault("dino_resampler_adapter", m_ad.init_visual_thinking_params(
        next(keys), pipe.dinov2_cfg.hidden_size, pipe.dit_cfg.txt_in_dim,
        dtype=adt))
    adapters.setdefault("dino_time_embed", (jax.random.normal(
        next(keys), (MAX_KEY_FRAMES, pipe.dinov2_cfg.hidden_size)) * 0.02
        ).astype(adt))
    adapters.setdefault("vae_resampler", m_ad.init_perceiver_params(
        next(keys), dim=64, num_latents=m_ad.SPECIAL_TOKEN_NUM,
        max_num_media_tokens=10240, dtype=adt))
    adapters.setdefault("vae_resampler_adapter", m_ad.init_visual_thinking_params(
        next(keys), 64, pipe.dit_cfg.txt_in_dim, dtype=adt))
    adapters.setdefault("vae_time_embed", (jax.random.normal(
        next(keys), (MAX_KEY_FRAMES, 64)) * 0.02).astype(adt))
    lora = jlora.init_dit_lora(next(keys), pipe.dit_cfg, rank=cfg.lora_rank,
                               dtype=getattr(jnp, cfg.lora_dtype))
    return {"lora": lora, "adapters": adapters}


class Trainer:
    def __init__(self, pipe, dataset, cfg: TrainConfig, logger=None, mesh=None):
        """mesh: optional jax.sharding.Mesh for multi-chip training — the
        frozen DiT is tensor-parallel over `model`, the batch is sharded
        over `data`, and GSPMD inserts the gradient all-reduce (the DDP
        equivalent; parallel/sharding.py)."""
        self.pipe = pipe
        self.dataset = dataset
        self.cfg = cfg
        self.logger = logger
        self.mesh = mesh
        self.optimizer = make_optimizer(
            cfg.learning_rate, cfg.weight_decay,
            cfg.gradient_accumulation_steps,
            state_dtype=(None if cfg.optimizer_state_dtype == "float32"
                         else getattr(jnp, cfg.optimizer_state_dtype)),
            name=cfg.optimizer)
        self.trainable = init_trainable(pipe, cfg)
        self.opt_state = self.optimizer.init(self.trainable)
        self._report_trainable()
        self.rng = np.random.default_rng(cfg.seed)
        self.t_min, self.t_max = fm.adapter_t_range()
        self.train_sched = fm.qwen_training_schedule()
        self.global_step = 0
        self.start_epoch = 0
        self.skip_batches = 0
        self.frozen = {"dit": pipe.dit_params}
        if cfg.quantize_frozen == "w4":
            from physicedit_tpu.kernels.quant_matmul import (
                DIT_OUTER_KEYS, quantize_tree_int4)

            self.frozen = {"dit": quantize_tree_int4(
                pipe.dit_params, min_size=cfg.quantize_min_size,
                skip_top=DIT_OUTER_KEYS)}
        elif cfg.quantize_frozen != "none":
            raise ValueError(f"unknown quantize_frozen: {cfg.quantize_frozen}")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from physicedit_tpu.parallel import sharding as shd

            rep = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), t)
            if cfg.quantize_frozen == "w4":
                # int4 residency + mesh: the packed-nibble layout cannot
                # ride the bf16 tensor-parallel specs (K is packed two-
                # per-byte with a global lo/hi split), so the quantized
                # tree replicates over a data-parallel mesh and TP is
                # rejected — they are alternative memory strategies.
                if mesh.shape.get(shd.MODEL_AXIS, 1) != 1:
                    raise ValueError(
                        "quantize_frozen='w4' is the single-chip/DP "
                        "residency plan; tensor-parallel meshes use bf16 "
                        "sharding (pick one)")
                self.frozen = {"dit": rep(self.frozen["dit"])}
            else:
                self.frozen = {"dit": shd.shard_params(
                    pipe.dit_params, shd.dit_param_specs(pipe.dit_params),
                    mesh)}
            self.trainable = rep(self.trainable)
            self.opt_state = rep(self.opt_state)

    def _report_trainable(self):
        """Trainable-parameter breakdown at start (train_physicedit.py:460-509)."""
        import jax

        def count(tree):
            return sum(x.size for x in jax.tree_util.tree_leaves(tree))

        lora_n = count(self.trainable.get("lora"))
        parts = {k: count(v) for k, v in self.trainable["adapters"].items()}
        total = lora_n + sum(parts.values())
        print(f"[TRAIN] trainable params: {total / 1e6:.1f}M "
              f"(lora {lora_n / 1e6:.1f}M, "
              + ", ".join(f"{k} {v / 1e6:.2f}M" for k, v in parts.items()) + ")")

    # ------------------------------------------------------------------

    def resume(self, resume_from: str):
        path, meta = ckpt.resolve_resume(resume_from)
        from physicedit_tpu.io.safetensors_io import load_state_dict

        sd = {k: np.asarray(v, np.float32)
              for k, v in load_state_dict(path).items()}
        lora_sd, pipe_sd = jlora.split_finetuned_checkpoint(sd)
        if lora_sd:
            stripped = {k.replace("pipe.dit.", ""): v for k, v in lora_sd.items()}
            self.trainable["lora"] = jlora.import_dit_lora(stripped, self.pipe.dit_cfg)
        if pipe_sd:
            from physicedit_tpu.io.convert import physic_adapters_from_state_dict

            loaded = physic_adapters_from_state_dict(pipe_sd, jnp.float32)
            self.trainable["adapters"].update(loaded)
        # Weights-only resume: fresh optimizer state (reference behaviour,
        # train_physicedit.py:578-580).
        self.opt_state = self.optimizer.init(self.trainable)
        if "sample_index" in meta:
            # exact dataset position recorded at save time — immune to
            # skipped samples and partial pending batches
            self.global_step = int(meta.get("global_step", 0))
            self.start_epoch = int(meta.get("epoch", 0))
            self.skip_batches = int(meta["sample_index"])
            if self.skip_batches >= len(self.dataset):
                self.start_epoch += 1
                self.skip_batches = 0
        else:
            # legacy sidecars: global_step counts OPTIMIZER steps
            # (batch_size samples each), the epoch loop skips by dataset
            # index — convert via the steps-per-epoch heuristic
            self.global_step, self.start_epoch, skip_steps = \
                ckpt.resume_position(
                    meta, num_processes=1,
                    batches_per_epoch=max(
                        len(self.dataset) // self.cfg.batch_size, 1))
            self.skip_batches = skip_steps * self.cfg.batch_size
        print(f"[RESUME] step={self.global_step} epoch={self.start_epoch} "
              f"skip={self.skip_batches} samples")

    # ------------------------------------------------------------------

    def preprocess(self, sample: dict) -> dict | None:
        """One dataset sample -> fixed-shape device batch (B=1)."""
        pipe = self.pipe
        edit_image = sample["edit_image"]
        target_image = sample["image"]
        keys = (sample.get("middle_key_frames") or [])[:MAX_KEY_FRAMES]
        if not keys:
            return None

        input_latents = pipe.encode_image(target_image)
        edit_latents = pipe.encode_image(edit_image)
        edit_tokens = patchify(edit_latents)

        # Train-time verbal conditioning comes from the dataset triplet
        # (qwen_image_physical.py:976-983), not a live VLM generation.
        # NOTE the reference-faithful quirks: the text is concatenated to
        # the prompt with NO separator (prompt += physical_txt,
        # qwen_image_physical.py:818) and uses title-case labels, while
        # inference appends "\nmiddle_transition_prompt: ..." — the
        # reference trains and infers on different conditioning formats,
        # and the exported adapters expect exactly this.
        triplet = sample.get("triplet") or {}
        physical_txt = (
            f"Middle Transition Prompt: {triplet.get('middle_transition_prompt', '')}\n"
            f"Final State Prompt: {triplet.get('final_state_prompt', '')}")
        emb, special = pipe.encode_prompt_edit(
            sample["prompt"] + physical_txt, edit_image)
        if special is None:
            return None

        # Raw frozen-backbone features for the prior branches.
        dino_mid = visual_prior.dino_preprocess(keys, self.rng)
        dino_src = visual_prior.dino_preprocess([edit_image], self.rng)
        feats_mid = np.asarray(m_dino.dinov2_features(
            pipe.dinov2_params, pipe.dinov2_cfg,
            jnp.asarray(dino_mid, jnp.float32)))
        feats_src = np.asarray(m_dino.dinov2_features(
            pipe.dinov2_params, pipe.dinov2_cfg,
            jnp.asarray(dino_src, jnp.float32)))

        # One batched VAE encode for all key frames (same crop size).
        mid_arr = np.stack([np.asarray(k.convert("RGB"), np.float32) / 127.5 - 1.0
                            for k in keys])
        from physicedit_tpu.models import vae as m_vae

        mid_lat = m_vae.encode_jit(pipe.vae_params,
                                   jnp.asarray(mid_arr, jnp.float32),
                                   pipe.vae_cfg)
        vae_mid = np.asarray(patchify(mid_lat))
        vae_src = np.asarray(edit_tokens)

        # Pad frames to MAX_KEY_FRAMES with zeros for the fixed-shape jit
        # batch; mid_frame_mask excludes the pad from the resampler keys
        # (the reference never pads — torch shapes are dynamic), so the
        # pseudo targets match compute_visual_priors on the real frames.
        f = feats_mid.shape[0]
        mid_frame_mask = np.arange(MAX_KEY_FRAMES) < f
        if f < MAX_KEY_FRAMES:
            feats_mid = np.concatenate(
                [feats_mid, np.zeros((MAX_KEY_FRAMES - f,) + feats_mid.shape[1:],
                                     feats_mid.dtype)], 0)
            vae_mid = np.concatenate(
                [vae_mid, np.zeros((MAX_KEY_FRAMES - f,) + vae_mid.shape[1:],
                                   vae_mid.dtype)], 0)

        # Bucket the text length (shared contract with the pipeline).
        from physicedit_tpu.pipeline.vl_host import bucket_pad_text

        prompt_emb, txt_mask = bucket_pad_text([emb], self.cfg.txt_len_bucket)
        bucket = txt_mask.shape[1]

        h, w = input_latents.shape[1], input_latents.shape[2]
        eh, ew = edit_latents.shape[1], edit_latents.shape[2]
        ropes = m_rope.build_rope_tables(
            [(1, h // 2, w // 2), (1, eh // 2, ew // 2)], bucket,
            axes_dim=pipe.rope_axes)

        tid = int(self.rng.integers(0, fm.NUM_TRAIN_TIMESTEPS))
        noise = self.rng.standard_normal(input_latents.shape).astype(np.float32)
        return {
            "input_latents": jnp.asarray(np.asarray(input_latents), jnp.float32),
            "noise": jnp.asarray(noise),
            "sigma": jnp.asarray([self.train_sched.sigmas[tid]]),
            "timestep": jnp.asarray([self.train_sched.timesteps[tid]]),
            "weight": jnp.asarray([self.train_sched.weights[tid]]),
            "edit_tokens": jnp.asarray(np.asarray(edit_tokens), jnp.float32),
            "prompt_emb": jnp.asarray(prompt_emb),
            "txt_mask": jnp.asarray(txt_mask),
            "special_idx": jnp.asarray(special[None].astype(np.int32)),
            "dino_mid_feats": jnp.asarray(feats_mid[None]),
            "dino_src_feats": jnp.asarray(feats_src[None]),
            "vae_mid_tokens": jnp.asarray(vae_mid[None]),
            "vae_src_tokens": jnp.asarray(vae_src[None]),
            "mid_frame_mask": jnp.asarray(mid_frame_mask[None]),
            "img_cos": jnp.asarray(ropes[0]), "img_sin": jnp.asarray(ropes[1]),
            "txt_cos": jnp.asarray(ropes[2]), "txt_sin": jnp.asarray(ropes[3]),
        }

    # ------------------------------------------------------------------

    def collate(self, batches: list) -> dict:
        """Stack B=1 preprocessed batches into one global batch, padding the
        text axis to the longest bucket; shared rope tables come from the
        longest sample."""
        if len(batches) == 1:
            return batches[0]
        s_t = max(int(b["prompt_emb"].shape[1]) for b in batches)
        widest = max(batches, key=lambda b: int(b["prompt_emb"].shape[1]))
        out = {}
        for k in batches[0]:
            if k in ("img_cos", "img_sin"):
                out[k] = widest[k]
            elif k in ("txt_cos", "txt_sin"):
                out[k] = widest[k]
            elif k in ("prompt_emb", "txt_mask"):
                parts = []
                for b in batches:
                    arr = np.asarray(b[k])
                    pad = s_t - arr.shape[1]
                    if pad:
                        widths = [(0, 0), (0, pad)] + [(0, 0)] * (arr.ndim - 2)
                        arr = np.pad(arr, widths)
                    parts.append(arr)
                out[k] = jnp.asarray(np.concatenate(parts, 0))
            else:
                out[k] = jnp.asarray(
                    np.concatenate([np.asarray(b[k]) for b in batches], 0))
        return out

    def _place_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        from physicedit_tpu.parallel import sharding as shd

        b = int(batch["input_latents"].shape[0])
        placed = {}
        multi_process = jax.process_count() > 1
        for k, v in batch.items():
            data_sharded = hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b                 and k not in ("img_cos", "img_sin", "txt_cos", "txt_sin")
            spec = P(shd.DATA_AXIS) if data_sharded else P()
            sharding = NamedSharding(self.mesh, spec)
            if multi_process and data_sharded:
                # multi-host: v holds only THIS process's rows (the data
                # loader sliced by parallel.multihost.host_local_batch_slice)
                placed[k] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(v))
            else:
                placed[k] = jax.device_put(v, sharding)
        return placed

    def _refresh_noise(self, micro: dict) -> dict:
        """Redraw the stochastic fields (noise + timestep sample) of a
        cached sample: the cache stores encoder outputs; the diffusion
        noising must differ per visit, like the inline path."""
        micro = dict(micro)
        tid = int(self.rng.integers(0, fm.NUM_TRAIN_TIMESTEPS))
        micro["noise"] = jnp.asarray(self.rng.standard_normal(
            np.asarray(micro["input_latents"]).shape).astype(np.float32))
        micro["sigma"] = jnp.asarray([self.train_sched.sigmas[tid]])
        micro["timestep"] = jnp.asarray([self.train_sched.timesteps[tid]])
        micro["weight"] = jnp.asarray([self.train_sched.weights[tid]])
        return micro

    def cache_preprocessed(self, output_dir: str) -> int:
        """Run the frozen-encoder preprocessing once and write each sample
        as an ``.npz`` bundle — the reference's ``launch_data_process_task``
        data-process mode (trainers/utils.py:932-1002; cached inputs are
        then read back by UnifiedDataset's cache mode or
        CachedPreprocessedDataset).  The stochastic fields are re-drawn at
        train time (_refresh_noise).  Returns the number of cached samples.
        """
        import os

        os.makedirs(output_dir, exist_ok=True)
        n = 0
        for i in range(len(self.dataset)):
            sample = self.dataset[i]
            if sample is None:
                continue
            micro = self.preprocess(sample)
            if micro is None:
                continue
            np.savez_compressed(
                os.path.join(output_dir, f"{i:06d}.npz"),
                **{k: np.asarray(v) for k, v in micro.items()})
            n += 1
        print(f"[TRAIN] cached {n} preprocessed samples -> {output_dir}")
        return n

    def train(self):
        cfg = self.cfg
        frozen = self.frozen
        pending = []
        skipped = 0
        from physicedit_tpu.train.prefetch import prefetch_samples

        for epoch in range(self.start_epoch, cfg.num_epochs):
            usable = 0
            start = (self.skip_batches if epoch == self.start_epoch else 0)
            for i, sample in prefetch_samples(
                    self.dataset, range(start, len(self.dataset)),
                    num_workers=cfg.loader_workers):
                self._epoch_pos = i + 1  # exact resume position (save())
                if sample is None:
                    continue
                micro = (self._refresh_noise(sample) if cfg.cached_inputs
                         else self.preprocess(sample))
                if micro is None:
                    skipped += 1
                    continue
                pending.append(micro)
                usable += 1
                if len(pending) < cfg.batch_size:
                    continue
                batch = self._place_batch(self.collate(pending))
                pending = []
                t0 = time.perf_counter()
                self.trainable, self.opt_state, metrics = train_step(
                    self.trainable, frozen, self.opt_state, batch,
                    self.pipe.dit_cfg, self.optimizer, self.t_min, self.t_max,
                    attn_impl=self.pipe.attn_impl, use_remat=cfg.use_remat)
                self.global_step += 1
                dt = time.perf_counter() - t0
                if self.logger is not None:
                    self.logger.log_step(self.global_step, epoch, metrics, dt)
                if cfg.save_every_n_steps and \
                        self.global_step % cfg.save_every_n_steps == 0:
                    self.save(epoch)
                if cfg.eval_every_n_steps and \
                        self.global_step % cfg.eval_every_n_steps == 0:
                    self.evaluate((i + 1) % len(self.dataset))
            if self.global_step == 0 and usable == 0:
                # every sample was skipped — e.g. an image-pair dataset
                # (Pica100k) without middle_key_frames: the PhysicEdit
                # loss needs the visual-prior frames (SURVEY P4/P9);
                # fail loudly instead of saving untrained checkpoints
                raise RuntimeError(
                    f"epoch {epoch} produced no usable samples "
                    f"({skipped} skipped): this trainer's PhysicEdit loss "
                    f"requires middle_key_frames (PhysicTran-style video "
                    f"data)")
            if skipped:
                print(f"[TRAIN] epoch {epoch}: skipped {skipped} samples "
                      f"without usable key frames/special tokens")
                skipped = 0
            self.save(epoch)
        if self.global_step == 0:
            # samples were usable but never filled one batch (pending
            # carries across epochs, so only the end of the run is certain)
            raise RuntimeError(
                f"no training step ran: batch_size={cfg.batch_size} "
                f"exceeds the {len(pending)} usable samples accumulated "
                f"over {cfg.num_epochs - self.start_epoch} epoch(s) — "
                f"lower batch_size or add data")
        if pending:
            print(f"[TRAIN] {len(pending)} usable samples left in a "
                  f"partial batch (batch_size={cfg.batch_size}) were not "
                  f"trained on")

    def evaluate(self, sample_idx: int = 0, seed: int = 42,
                 num_inference_steps: int = 40):
        """Fixed-seed eval generation with a [edit | GT | output] strip
        (mirrors WandbModelLogger.evaluate_model, train_physicedit.py:39-169,
        including restoring nothing: our scheduler is stateless, so the
        reference's shared-scheduler-state pitfall does not exist here)."""
        from PIL import Image

        if self.cfg.cached_inputs:
            # cached datasets yield preprocessed tensor dicts, not
            # prompt/PIL samples — the reference's eval probe has no
            # equivalent in its launch_data_process_task mode either
            print("[EVAL] skipped: cached_inputs datasets carry no "
                  "prompt/image samples to generate from")
            return None
        sample = self.dataset[sample_idx]
        if sample is None:
            return None
        pipe = self.pipe
        saved_adapters = pipe.adapters
        # copy: train_step donates the trainable buffers, so the pipeline
        # must not keep references to the live arrays after this eval
        copy = jax.tree_util.tree_map(jnp.array, self.trainable["adapters"])
        pipe.adapters = dict(pipe.adapters, **copy)
        pipe.dit_lora = jax.tree_util.tree_map(jnp.array,
                                               self.trainable["lora"])
        try:
            out = pipe(sample["prompt"], edit_image=sample["edit_image"],
                       seed=seed, num_inference_steps=num_inference_steps,
                       height=self.cfg.height, width=self.cfg.width,
                       have_text_reasoning=False, edit_image_auto_resize=False)
        finally:
            pipe.dit_lora = None
            pipe.adapters = saved_adapters
        size = (self.cfg.width, self.cfg.height)
        strip = Image.new("RGB", (size[0] * 3, size[1]))
        strip.paste(sample["edit_image"].resize(size), (0, 0))
        strip.paste(sample["image"].resize(size), (size[0], 0))
        strip.paste(out.resize(size), (size[0] * 2, 0))
        if self.logger is not None:
            self.logger.log_eval_image(self.global_step, strip,
                                       caption=sample["prompt"])
        import os

        os.makedirs(self.cfg.output_path, exist_ok=True)
        path = os.path.join(self.cfg.output_path,
                            f"eval-step-{self.global_step}.jpg")
        strip.save(path)
        print(f"[EVAL] step={self.global_step} -> {path}")
        return strip

    def save(self, epoch: int) -> str:
        path = ckpt.save_checkpoint(
            self.cfg.output_path, self.trainable, self.global_step, epoch,
            batches_per_epoch=len(self.dataset),
            sample_index=getattr(self, "_epoch_pos", 0))
        print(f"[ckpt] saved {path}")
        return path
