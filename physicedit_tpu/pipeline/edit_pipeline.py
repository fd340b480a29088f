"""The PhysicEdit edit pipeline: image + instruction -> edited image.

TPU-native orchestrator replacing QwenImagePhysicPipeline
(diffsynth/pipelines/qwen_image_physical.py:183-669).  The reference's
declarative unit graph becomes explicit staged methods; everything
tensor-shaped runs inside three jitted programs (VL encode, denoise scan,
VAE decode/encode) and the Python between them only does host-side string /
geometry work.

Stage map (reference unit -> here):
  ShapeChecker           -> __call__ rounding (/16)
  NoiseInitializer       -> generate_noise (seeded; optional torch-CPU
                            backend for bit-parity with reference seeds)
  EditImageEmbedder      -> encode_edit_image (1024-sq auto-resize, VAE)
  PhysicalVerbalEmbedder -> reason_physical (VL greedy decode + JSON parse)
  PromptEmbedder         -> encode_prompt_edit (special-token suffix, VL
                            encode, drop_idx, special-token positions)
  denoise loop           -> sampling/denoise.denoise (lax.scan, CFG batched)
  VAE decode             -> models/vae.decode
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from physicedit_tpu.io import convert as C
from physicedit_tpu.io.safetensors_io import detect_model_name, load_state_dict
from physicedit_tpu.models import dit as m_dit
from physicedit_tpu.models import qwen_vl as m_text
from physicedit_tpu.models import qwen_vl_vision as m_vis
from physicedit_tpu.models import vae as m_vae
from physicedit_tpu.models import dinov2 as m_dino
from physicedit_tpu.ops import rope as m_rope
from physicedit_tpu.ops.patchify import patchify
from physicedit_tpu.pipeline import prompt as P
from physicedit_tpu.pipeline import vl_host
from physicedit_tpu.sampling import flow_match as fm
from physicedit_tpu.sampling.denoise import denoise
from physicedit_tpu import lora as jlora

IMAGE_PAD_ID = 151655
VISION_START_ID = 151652


@dataclasses.dataclass
class PhysicEditPipeline:
    dit_params: dict
    vae_params: dict
    text_params: dict | None = None
    vision_params: dict | None = None
    dinov2_params: dict | None = None
    adapters: dict = dataclasses.field(default_factory=dict)

    dit_cfg: m_dit.DiTConfig = m_dit.QWEN_IMAGE_CONFIG
    vae_cfg: m_vae.VAEConfig = m_vae.QWEN_VAE_CONFIG
    text_cfg: m_text.QwenVLTextConfig = m_text.QWEN25_VL_7B_TEXT
    vision_cfg: m_vis.QwenVLVisionConfig = m_vis.QWEN25_VL_VISION
    dinov2_cfg: m_dino.DinoV2Config = m_dino.DINOV2_BASE

    tokenizer: object | None = None       # HF tokenizer (host-side only)
    dtype: object = jnp.bfloat16
    attn_impl: str = "xla"
    boi_token_id: int | None = None
    eoi_token_id: int | None = None
    image_pad_id: int = IMAGE_PAD_ID
    vision_start_id: int = VISION_START_ID
    edit_drop_idx: int = P.EDIT_DROP_IDX
    t2i_drop_idx: int = P.T2I_DROP_IDX
    rope_axes: tuple = m_rope.AXES_DIM
    dit_lora: dict | None = None   # live LoRA factors (train-time eval)
    controlnet_params: dict | None = None  # blockwise ControlNet (models/controlnet)
    txt_len_bucket: int = 64       # pad text length to multiples (bounds the
                                   # denoise compile-cache across prompts)
    kv_int8: bool = False          # int8 reasoner KV cache (serving mode:
                                   # halves the per-item cache residency)

    @property
    def attn_clamp(self) -> bool:
        """Load-time overflow-clamp decision for the fixed-max attention
        kernel (models/dit.attn_clamp_needed): with RMS-normed q/k the
        logit bound is set by the trained gammas; when it sits safely
        below the kernel's CLAMP, the per-element min() is dropped from
        the hot loop."""
        if getattr(self, "_attn_clamp", None) is None:
            from physicedit_tpu.models.dit import attn_clamp_needed

            self._attn_clamp = (True if self.dit_params is None
                                else attn_clamp_needed(self.dit_params))
        return self._attn_clamp

    def __post_init__(self):
        self.t_min, self.t_max = fm.adapter_t_range()

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_paths: list | None = None,
                        tokenizer_path: str | None = None,
                        dtype=jnp.bfloat16, attn_impl: str = "xla",
                        lora_path: str | None = None,
                        finetuned_path: str | None = None,
                        quantize: str | None = None,
                        model_id: str | None = None,
                        local_model_path: str = "./models",
                        skip_download: bool = False):
        """Build the pipeline from checkpoint files.

        model_paths: safetensors files/folders; each is identified by its
        key-hash (io/safetensors_io.py) like the reference ModelManager
        (model_manager.py:350-416).  Entries may also be
        io.model_config.ModelConfig descriptors, resolved (and hub-gate
        downloaded) here.  `finetuned_path` is a PhysicEdit training
        export: DiT-LoRA keys are merged into the DiT weights and
        `pipe.*` keys populate the adapters (validate.py:33-65 semantics).

        model_id: by-name preset resolution for the Qwen-Image family
        (io.model_config.QWEN_IMAGE_PRESETS — the rows the reference
        assembles at validate.py:94-125): supplies the transformer /
        text-encoder / VAE ModelConfigs and, unless overridden, the
        tokenizer folder.  `local_model_path`/`skip_download` parameterise
        those presets exactly like the reference's ModelConfig fields.
        """
        from physicedit_tpu.io.model_config import (ModelConfig,
                                                    qwen_image_preset)
        from physicedit_tpu.io.safetensors_io import EXTENSION_LOADERS

        if model_id is not None:
            preset = qwen_image_preset(model_id, local_model_path,
                                       skip_download)
            model_paths = list(model_paths or []) + preset["model_configs"]
            if tokenizer_path is None:
                tokenizer_path = preset["tokenizer_config"]
        if model_paths is None:
            raise ValueError("pass model_paths and/or a preset model_id")
        model_paths = [p.download_if_necessary()
                       if isinstance(p, ModelConfig) else p
                       for p in model_paths]
        if isinstance(tokenizer_path, ModelConfig):
            tokenizer_path = tokenizer_path.download_if_necessary()

        parts: dict = {}
        part_paths: dict = {}
        for path in model_paths:
            sd = load_state_dict(path)
            name = detect_model_name(sd)
            if name is None:
                raise ValueError(f"unrecognised checkpoint: {path}")
            if name in EXTENSION_LOADERS:
                raise ValueError(
                    f"{path} is a '{name}' checkpoint: not a pipeline part; "
                    f"load it with {EXTENSION_LOADERS[name]}")
            parts[name] = sd
            part_paths[name] = path[0] if isinstance(path, (list, tuple)) \
                else path

        adapters = {}
        dit_sd = parts.get("qwen_image_dit")
        if finetuned_path is not None:
            ft = load_state_dict(finetuned_path)
            lora_sd, pipe_sd = jlora.split_finetuned_checkpoint(
                {k: np.asarray(v, np.float32) for k, v in ft.items()})
            lora_sd = {k.replace("pipe.dit.", ""): v for k, v in lora_sd.items()}
            if dit_sd is not None and lora_sd:
                dit_sd = jlora.merge_lora_into_state_dict(dit_sd, lora_sd)
            adapters = C.physic_adapters_from_state_dict(pipe_sd, jnp.float32)
        elif lora_path is not None and dit_sd is not None:
            lsd = {k: np.asarray(v, np.float32)
                   for k, v in load_state_dict(lora_path).items()}
            dit_sd = jlora.merge_lora_into_state_dict(dit_sd, lsd)

        kw = dict(adapters=adapters, dtype=dtype, attn_impl=attn_impl)
        if dit_sd is not None:
            kw["dit_params"] = C.dit_from_torch(dit_sd, dtype=dtype)
            kw["dit_cfg"] = C.dit_config_from_params(kw["dit_params"])
        if "qwen_image_vae" in parts:
            kw["vae_params"] = C.vae_from_torch(parts["qwen_image_vae"], dtype=dtype)
            kw["vae_cfg"] = C.vae_config_from_params(kw["vae_params"])
        if "qwen_image_text_encoder" in parts:
            sd = _remap_text_encoder_keys(parts["qwen_image_text_encoder"])
            kw["text_params"] = C.qwen_vl_text_from_torch(sd, dtype=dtype)
            kw["vision_params"] = C.qwen_vl_vision_from_torch(sd, dtype=dtype)
            # size-robust configs: every HF text-encoder checkpoint ships a
            # config.json next to its safetensors (the reference hard-codes
            # the 7B constants instead, qwen_image_text_encoder_withdecode
            # .py:8-146)
            cfg_json = os.path.join(
                os.path.dirname(part_paths["qwen_image_text_encoder"]),
                "config.json")
            if os.path.exists(cfg_json):
                import json

                with open(cfg_json) as f:
                    hf_cfg = json.load(f)
                kw["text_cfg"] = C.text_config_from_hf(hf_cfg)
                kw["vision_cfg"] = C.vision_config_from_hf(hf_cfg)
                kw["image_pad_id"] = kw["text_cfg"].image_token_id
                kw["vision_start_id"] = kw["text_cfg"].vision_start_token_id

        if quantize == "int8":
            # W8A8 for the DiT (compute) and the VL decoder (its greedy
            # decode is weight-bandwidth-bound, where int8 weights halve
            # HBM traffic).  Opt-in: small quality cost (ops/quant.py).
            from physicedit_tpu.ops.quant import quantize_tree

            if "dit_params" in kw:
                kw["dit_params"] = quantize_tree(kw["dit_params"])
            if "text_params" in kw:
                kw["text_params"] = quantize_tree(kw["text_params"])
        elif quantize in ("int4", "w4"):
            # Packed-int4 weights (kernels/quant_matmul.py): the whole
            # 20B DiT + 7B VL fit ONE 16 GB chip HBM-resident — the
            # single-chip deployment config (docs/SERVING.md).
            from physicedit_tpu.kernels.quant_matmul import (
                DIT_OUTER_KEYS, quantize_tree_int4)

            if "dit_params" in kw:
                # blocks int4, embed/head layers bf16: the outer GEMMs run
                # once per forward (~0.1% of the time) but carry 5x of the
                # cumulative quantization divergence (quant_divergence lane)
                kw["dit_params"] = quantize_tree_int4(
                    kw["dit_params"], skip_top=DIT_OUTER_KEYS)
            if "text_params" in kw:
                from physicedit_tpu.models.qwen_vl import (
                    fuse_decode_projections, quantize_embedding_int8)

                # fused qkv / gate_up: one GEMV + one row-quantize per
                # group — the launch-latency win for the M=1 reasoner
                # decode; the embedding table goes int8 (per-row scales,
                # -0.55 GB of the single-chip residency budget)
                from physicedit_tpu.models.qwen_vl import split_layers

                # fused qkv / gate_up, int8 embedding, and PER-LAYER weight
                # trees: the unrolled layer loop lets the Pallas W4 GEMVs
                # read each layer's buffer in place instead of paying the
                # scan-xs slice materialisation (~2.2 ms/decode token,
                # tools/proto_decode_unroll.py)
                kw["text_params"] = split_layers(quantize_embedding_int8(
                    fuse_decode_projections(
                        quantize_tree_int4(kw["text_params"]))))
                kw["kv_int8"] = True
            if "vision_params" in kw:
                # the 675M-param ViT is 1.35 GB bf16 — W4 makes it 0.34,
                # the difference between the full stack fitting one chip
                # with reasoner caches or not (docs/SERVING.md)
                kw["vision_params"] = quantize_tree_int4(kw["vision_params"])
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode: {quantize!r}")

        pipe = cls(**kw)
        if tokenizer_path is not None:
            pipe.load_tokenizer(tokenizer_path)
        return pipe

    def shard(self, mesh):
        """Distribute the pipeline over a device mesh for inference.

        The TPU-native replacement for the reference's CPU-offload VRAM
        manager (qwen_image_physical.py:375-494): the 20B DiT and the 7B VL
        decoder are tensor-parallel over the `model` axis (Megatron
        column/row splits, parallel/sharding.py); everything else is
        replicated.  The already-jitted denoise / encode programs follow
        the parameter shardings via GSPMD — no code changes downstream.
        """
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from physicedit_tpu.parallel import sharding as sh

        def has_quantized(node):
            if isinstance(node, dict):
                return "w4" in node or "w_q" in node \
                    or any(has_quantized(v) for v in node.values())
            if isinstance(node, list):
                return any(has_quantized(v) for v in node)
            return False

        if has_quantized(self.dit_params) or (
                self.text_params is not None
                and has_quantized(self.text_params)):
            # Tensor-parallel specs split the bf16 'w' leaves; the packed
            # layouts (nibble-packed K, int8 per-channel scales) have no
            # specs and would KeyError deep in shard_params.  The two are
            # alternative memory strategies (docs/SERVING.md).
            raise ValueError(
                "shard() needs unquantized bf16 weights: quantized "
                "residency (quantize='int8'/'int4') and mesh sharding are "
                "alternative memory strategies — reload with quantize=None "
                "to tensor-parallel over a mesh")

        def replicate(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, PS())), tree)

        self.dit_params = sh.shard_params(
            self.dit_params, sh.dit_param_specs(self.dit_params), mesh)
        if self.text_params is not None:
            self.text_params = sh.shard_params(
                self.text_params,
                sh.qwen_vl_text_param_specs(self.text_params), mesh)
        for name in ("vae_params", "vision_params", "dinov2_params"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, replicate(v))
        if self.adapters:
            self.adapters = replicate(self.adapters)
        if self.dit_lora is not None:
            self.dit_lora = replicate(self.dit_lora)
        self.mesh = mesh
        return self

    def load_lora(self, lora_path: str, alpha: float = 1.0,
                  hotload: bool = False):
        """Load a DiT LoRA (reference load_lora semantics,
        qwen_image_physical.py:250-276).

        hotload=False merges `W += alpha * B @ A` into the DiT weights via a
        convert round-trip; hotload=True keeps the factors live
        (AutoWrappedLinear-equivalent: applied per forward, clearable).
        """
        sd = {k: np.asarray(v, np.float32)
              for k, v in load_state_dict(lora_path).items()}
        sd = {k.replace("pipe.dit.", ""): v for k, v in sd.items()}
        if hotload:
            lora = jlora.import_dit_lora(sd, self.dit_cfg)
            if alpha != 1.0:
                lora = jax.tree_util.tree_map(lambda x: x, lora)
                for leaf in lora.values():
                    leaf["A"] = leaf["A"] * alpha
            self.dit_lora = lora
            return
        # Offline merge path: factors -> deltas applied onto the converted
        # pytree directly (equivalent to GeneralLoRALoader.load,
        # diffsynth/lora/__init__.py:33-45).
        factors = jlora.import_dit_lora(sd, self.dit_cfg)
        self.dit_params = _merge_lora_pytree(self.dit_params, factors, alpha)

    def clear_lora(self):
        """Drop hot-loaded LoRA factors (reference clear_lora, :279-285)."""
        self.dit_lora = None

    def load_tokenizer(self, path: str):
        from transformers import Qwen2Tokenizer

        tok = Qwen2Tokenizer.from_pretrained(path)
        tok.add_special_tokens({"additional_special_tokens": P.SPECIAL_TOKENS})
        self.tokenizer = tok
        self.boi_token_id = tok.convert_tokens_to_ids("<begin_of_img>")
        self.eoi_token_id = tok.convert_tokens_to_ids("<end_of_img>")

    # ------------------------------------------------------------------
    # Stages
    # ------------------------------------------------------------------

    def generate_noise(self, shape, seed: int | None, backend: str = "auto"):
        """Seeded latent noise [1, h, w, 16].

        backend="torch" reproduces the reference's CPU-generator bitstream
        (utils/__init__.py:119-124) when torch is importable; "jax" uses a
        PRNGKey (documented divergence: different RNG, same distribution).
        """
        if backend == "auto":
            try:
                import torch  # noqa: F401
                backend = "torch"
            except ImportError:
                backend = "jax"
        if backend == "torch":
            import torch

            gen = None if seed is None else torch.Generator("cpu").manual_seed(seed)
            h, w, c = shape[1], shape[2], shape[3]
            # Reference draws directly in the pipeline dtype
            # (NoiseInitializer passes rand_torch_dtype=pipe.torch_dtype,
            # qwen_image_physical.py:688) — match the exact bitstream.
            tdt = torch.bfloat16 if self.dtype == jnp.bfloat16 else torch.float32
            noise = torch.randn((shape[0], c, h, w), generator=gen, dtype=tdt)
            arr = noise.float().numpy().transpose(0, 2, 3, 1)
            return jnp.asarray(arr, self.dtype)
        if seed is None:
            # fresh entropy per call (torch's seed=None draws a new
            # generator state; PRNGKey(0) would silently repeat noise)
            import os as _os

            seed = int.from_bytes(_os.urandom(8), "little") >> 1
        key = jax.random.PRNGKey(seed)
        return jax.random.normal(key, shape, self.dtype)

    def encode_image(self, image) -> jax.Array:
        """PIL -> VAE latents [1, H/8, W/8, 16]."""
        w, h = image.size
        assert h % 8 == 0 and w % 8 == 0, (
            f"image size {w}x{h} must be /8 (use the auto-resize paths)")
        arr = np.asarray(image.convert("RGB"), np.float32) / 127.5 - 1.0
        x = jnp.asarray(arr[None], self.dtype)
        return m_vae.encode_jit(self.vae_params, x, self.vae_cfg)

    def decode_image(self, latents: jax.Array):
        from PIL import Image

        img = m_vae.decode_jit(self.vae_params, latents.astype(self.dtype),
                               self.vae_cfg)
        arr = np.asarray(img[0].astype(jnp.float32))
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                "VAE decode produced non-finite pixels - upstream latents "
                "are NaN/Inf (check the schedule and model outputs)")
        arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return Image.fromarray(arr)

    def decode_images(self, latents: jax.Array) -> list:
        """Batched VAE decode: [N, h, w, 16] -> N PIL images in ONE device
        invocation (sweep serving used to decode per item)."""
        from PIL import Image

        imgs = m_vae.decode_jit(self.vae_params, latents.astype(self.dtype),
                                self.vae_cfg)
        arr = np.asarray(imgs.astype(jnp.float32))
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                "VAE decode produced non-finite pixels - upstream latents "
                "are NaN/Inf (check the schedule and model outputs)")
        arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return [Image.fromarray(a) for a in arr]

    def edit_image_auto_resize(self, image):
        """~1024-sq /32 resize (qwen_image_physical.py:1252-1263)."""
        w, h = vl_host.calculate_dimensions(1024 * 1024,
                                            image.size[0] / image.size[1])
        return image.resize((w, h))

    def _vision_features(self, images: list):
        """Run the vision tower over PIL images (pre-resized to the VL
        input size); returns (feats_per_image, grids).

        Sweep serving reuses these across the reasoner + positive +
        negative prompt encodes of the same edit image (the round-2 path
        re-ran the 32-layer ViT three times per item).  Same-grid images
        run BATCHED on a leading vmap axis (run_vision_batched) in chunks
        of 8 — the single-image tower is launch/small-GEMM bound (~99 ms
        for ~5 ms of MXU work), and a batch axis amortises that glue
        without the quadratic cost a concatenated-token-axis multi-image
        call pays (measured 17x slower per image at 8).  The chunk bounds
        the [B, H, N, N] attention transient next to the resident models.
        Mixed grids fall back to one image per call.
        """
        per_img = [vl_host.images_to_patches([im]) for im in images]
        grids = [g[0] for _, g in per_img]
        feats: list = [None] * len(images)
        chunk = 8
        by_grid: dict = {}
        for i, g in enumerate(grids):
            by_grid.setdefault(tuple(g), []).append(i)
        for g_one, idxs in by_grid.items():
            for c0 in range(0, len(idxs), chunk):
                sel = idxs[c0:c0 + chunk]
                if len(sel) == 1:
                    i = sel[0]
                    f = m_vis.run_vision(
                        self.vision_params, self.vision_cfg,
                        jnp.asarray(per_img[i][0], self.dtype), [g_one])
                    feats[i] = np.asarray(f.astype(jnp.float32))
                    continue
                stacked = jnp.asarray(
                    np.stack([per_img[i][0] for i in sel]), self.dtype)
                fb = np.asarray(m_vis.run_vision_batched(
                    self.vision_params, self.vision_cfg, stacked, g_one)
                    .astype(jnp.float32))
                for j, i in enumerate(sel):
                    feats[i] = fb[j]
        return feats, grids

    def _vl_host_inputs(self, text: str, images: list, feats=None,
                        grids=None):
        """Host side of one VL-encode row: (ids [S] np.int32,
        embeds [S, 3584] np.f32, pos [3, S]).  feats/grids optionally carry
        precomputed vision features (one array per image)."""
        ids = self.tokenizer(text).input_ids
        if images:
            if feats is None:
                feats, grids = self._vision_features(
                    [vl_host.resize_vl_image(im) for im in images])
            ids = vl_host.expand_image_pads(ids, grids, self.image_pad_id)
            feats_cat = np.concatenate(feats, axis=0)
        else:
            grids, feats_cat = [], None
        ids = np.asarray(ids, np.int32)
        embeds = np.asarray(
            m_text.embed_tokens(self.text_params, jnp.asarray(ids))
            .astype(jnp.float32))
        if feats_cat is not None:
            embeds = vl_host.scatter_vision_features(embeds, ids, feats_cat,
                                                     self.image_pad_id)
        pos = vl_host.get_rope_index(ids, grids, self.image_pad_id,
                                     self.vision_start_id)
        return ids, embeds, pos

    def _vl_hidden(self, text: str, images: list):
        """Tokenize + VL-encode; returns (ids [S], hidden [S, 3584])."""
        ids, embeds, pos = self._vl_host_inputs(text, images)
        hidden = m_text.text_forward(
            self.text_params, self.text_cfg,
            jnp.asarray(embeds[None], self.dtype),
            jnp.asarray(pos[:, None, :]), jnp.ones((1, len(ids)), bool))
        return ids, np.asarray(hidden[0].astype(jnp.float32))

    def _vl_hidden_batch(self, rows: list):
        """Batched VL encode: rows = [(text, images, feats, grids), ...] ->
        list of (ids, hidden[:len]) — ONE text_forward over all rows,
        right-padded to a shared /128 bucket (key-side masking keeps padded
        rows out of every live row's attention; padded tails are sliced
        off).  Replaces 2N sequential B=1 encodes in sweep serving."""
        items = [self._vl_host_inputs(t, ims, f, g) for t, ims, f, g in rows]
        b = len(items)
        s_max = max(len(it[0]) for it in items)
        s_pad = ((s_max + 127) // 128) * 128
        dim = items[0][1].shape[1]
        emb_b = np.zeros((b, s_pad, dim), np.float32)
        pos_b = np.zeros((3, b, s_pad), items[0][2].dtype)
        mask = np.zeros((b, s_pad), bool)
        for i, (ids, embeds, pos) in enumerate(items):
            s = len(ids)
            emb_b[i, :s] = embeds
            pos_b[:, i, :s] = pos
            pos_b[:, i, s:] = pos.max() + 1
            mask[i, :s] = True
        # chunks of 4 rows: bounds the per-call activation transients
        # (gate_up at [rows*S, 37888] bf16) next to the resident models
        chunk = 4
        hidden = np.concatenate([
            np.asarray(m_text.text_forward(
                self.text_params, self.text_cfg,
                jnp.asarray(emb_b[c0:c0 + chunk], self.dtype),
                jnp.asarray(pos_b[:, c0:c0 + chunk]),
                jnp.asarray(mask[c0:c0 + chunk])).astype(jnp.float32))
            for c0 in range(0, b, chunk)])
        return [(it[0], hidden[i, : len(it[0])])
                for i, it in enumerate(items)]

    def _edit_hidden_post(self, ids, hidden):
        """Shared tail of the edit-path encode: drop the template prefix and
        locate the special-token span (boi/eoi)."""
        hidden = hidden[self.edit_drop_idx:]
        ids_d = ids[self.edit_drop_idx:]
        special = None
        if self.boi_token_id is not None:
            boi = np.where(ids_d == self.boi_token_id)[0]
            eoi = np.where(ids_d == self.eoi_token_id)[0]
            if boi.size and eoi.size:
                special = np.arange(boi[0] + 1, eoi[0])
        return hidden, special

    def encode_prompt_edit(self, prompt: str, edit_image):
        """Edit-path prompt encoding (qwen_image_physical.py:774-800).

        Returns (prompt_emb [S, 3584], special_positions [64] or None).
        """
        text = P.edit_prompt_text(prompt)
        ids, hidden = self._vl_hidden(text, [edit_image])
        return self._edit_hidden_post(ids, hidden)

    def encode_prompt_edit_batch(self, prompts: list, edit_images: list,
                                 feats_list=None, grids=None):
        """Batched edit-path prompt encoding: ONE text_forward for all
        rows, with optional precomputed vision features (one per image).
        Returns a list of (prompt_emb, special_positions)."""
        rows = []
        for i, (prompt, im) in enumerate(zip(prompts, edit_images)):
            f = None if feats_list is None else [feats_list[i]]
            g = None if feats_list is None else [grids[i]]
            rows.append((P.edit_prompt_text(prompt), [im], f, g))
        return [self._edit_hidden_post(ids, hidden)
                for ids, hidden in self._vl_hidden_batch(rows)]

    def encode_prompt(self, prompt: str):
        """T2I-path prompt encoding (no image, drop_idx 34)."""
        ids, hidden = self._vl_hidden(P.T2I_TEMPLATE.format(prompt), [])
        return hidden[self.t2i_drop_idx:], None

    def encode_prompt_batch(self, prompts: list):
        """Batched T2I-path prompt encoding: ONE bucketed text_forward for
        all rows (EliGen encodes every entity prompt this way instead of N
        sequential B=1 forwards).  Returns [emb [S_i, 3584], ...]."""
        rows = [(P.T2I_TEMPLATE.format(p), [], None, None) for p in prompts]
        return [hidden[self.t2i_drop_idx:]
                for _ids, hidden in self._vl_hidden_batch(rows)]

    def encode_prompt_edit_multi(self, prompt: str, edit_images: list):
        """Multi-image edit prompt ("Picture i:" convention,
        qwen_image_physical.py:802-813).  No special-token suffix here,
        matching the reference multi path."""
        text = P.multi_edit_prompt_text(prompt, len(edit_images))
        ids, hidden = self._vl_hidden(text, edit_images)
        return hidden[self.edit_drop_idx:], None

    def reason_physical(self, prompt: str, edit_image,
                        max_new_tokens: int = 1000) -> str:
        """Inference-time physical reasoner (qwen_image_physical.py:943-986)."""
        return self.reason_physical_batch([prompt], [edit_image],
                                          max_new_tokens)[0]

    def _reasoner_inputs(self, prompt: str, edit_image, feats=None,
                         grid=None):
        """Host side of one reasoner prompt: (embeds [s, D] fp32 np,
        rope pos [3, s], s).  feats/grid optionally reuse vision features
        computed once per edit image (shared with the prompt encodes)."""
        text = P.reasoner_chat_text(P.REASONER_SYSTEM_PROMPT, [
            ("text", "Edit Instruction:"), ("text", prompt),
            ("text", "Edit Image:"), ("image",)])
        f = None if feats is None else [feats]
        g = None if feats is None else [grid]
        ids, embeds, pos = self._vl_host_inputs(
            text, [edit_image], f, g)
        return embeds, pos, len(ids)

    def reason_physical_batch(self, prompts: list, edit_images: list,
                              max_new_tokens: int = 1000,
                              vl_feats=None, vl_grids=None) -> list:
        """Physical reasoning for N edits in ONE prefill + decode.

        The greedy decode is weight-read-bound, so a batch of N rows costs
        nearly the same wall time as one (amortised in sweep serving via
        edit_batch).  Prompts are left-padded to a shared /128 bucket so
        prefill/decode programs are reused across calls; rows stop
        independently at EOS.
        """
        items = [self._reasoner_inputs(
                     p, im,
                     None if vl_feats is None else vl_feats[i],
                     None if vl_grids is None else vl_grids[i])
                 for i, (p, im) in enumerate(zip(prompts, edit_images))]
        b = len(items)
        s_max = max(s for _, _, s in items)
        # Bucket BOTH the prompt length (left-pad, masked) and the cache
        # length so every reasoner call with a similar-length prompt reuses
        # one compiled prefill + decode program.
        s_pad = ((s_max + 127) // 128) * 128
        max_total = s_pad + max_new_tokens
        dim = items[0][0].shape[1]
        embeds_p = np.zeros((b, s_pad, dim), np.float32)
        pos_p = np.zeros((3, b, s_pad), items[0][1].dtype)
        attn_mask = np.zeros((b, s_pad), bool)
        start_rope = np.zeros((b,), np.int32)
        for i, (emb, pos, s) in enumerate(items):
            embeds_p[i, s_pad - s:] = emb
            pos_p[:, i, s_pad - s:] = pos
            attn_mask[i, s_pad - s:] = True
            start_rope[i] = int(pos.max()) + 1
        # Prefill one row at a time (caches concatenate on the batch
        # axis): prefill cost is GEMM-bound and linear in rows, so
        # chunking is FREE throughput-wise, and the monolithic B=8
        # prefill's gate_up transient alone (~0.9 GB) does not fit next
        # to the resident models at the serving batch
        # (bench.memory_budget).  The decode then runs over the full
        # batch — that is where the amortisation lives.
        chunk = 1
        logits_parts, cache_parts = [], []
        for c0 in range(0, b, chunk):
            lg, cc, _ = m_text.prefill(
                self.text_params, self.text_cfg,
                jnp.asarray(embeds_p[c0:c0 + chunk], self.dtype),
                jnp.asarray(pos_p[:, c0:c0 + chunk]),
                jnp.asarray(attn_mask[c0:c0 + chunk]),
                max_total, kv_int8=self.kv_int8)
            logits_parts.append(lg)
            cache_parts.append(cc)
        logits = jnp.concatenate(logits_parts, axis=0)
        caches = tuple(jnp.concatenate([p[i] for p in cache_parts], axis=1)
                       for i in range(len(cache_parts[0])))
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        key_mask = jnp.asarray(np.concatenate(
            [attn_mask, np.zeros((b, max_total - s_pad), bool)], axis=1))
        toks, _ = m_text.greedy_decode(
            self.text_params, self.text_cfg, caches, first, s_pad,
            jnp.asarray(start_rope), max_new_tokens, key_mask=key_mask)
        outs = []
        for row in np.asarray(toks):
            row = row.tolist()
            if self.text_cfg.eos_token_id in row:
                row = row[: row.index(self.text_cfg.eos_token_id)]
            decoded = self.tokenizer.decode(row, skip_special_tokens=True)
            outs.append(P.reasoner_text_from_response(decoded))
        return outs

    # ------------------------------------------------------------------
    # Full edit
    # ------------------------------------------------------------------

    def __call__(self, prompt: str, negative_prompt: str = "",
                 edit_image=None, cfg_scale: float = 4.0,
                 cfg_truncate_step: int | None = None,
                 inpaint_mask=None, inpaint_blur_size: int | None = None,
                 inpaint_blur_sigma: float | None = None,
                 height: int = 1328, width: int = 1328, seed: int | None = None,
                 num_inference_steps: int = 30,  # reference default (:565)
                 exponential_shift_mu: float | None = None,
                 denoising_strength: float = 1.0,
                 edit_image_auto_resize: bool = True,
                 edit_rope_interpolation: bool = False,
                 have_text_reasoning: bool = True,
                 input_image=None,
                 context_image=None,
                 eligen_entity_prompts: list | None = None,
                 eligen_entity_masks: list | None = None,
                 eligen_enable_on_negative: bool = False,
                 blockwise_controlnet_image=None,
                 blockwise_controlnet_scale: float = 1.0,
                 blockwise_controlnet_start: float = 1.0,
                 blockwise_controlnet_end: float = 0.0,
                 # Reference API-compat kwargs (qwen_image_physical.py:
                 # 545-597).  tiled/tile_size/tile_stride are accepted and
                 # ignored exactly like the reference VAE does
                 # (qwen_image_vae.py:706,719); rand_device="cpu" is the
                 # only reference behaviour (our seeded noise already
                 # reproduces the torch CPU bitstream); fp8 attention was
                 # measured slower than bf16 on TPU (BASELINE.md) and is a
                 # no-op; progress_bar_cmd has no per-step Python loop to
                 # wrap (the denoise is one lax.scan).
                 tiled: bool = False, tile_size: int = 128,
                 tile_stride: int = 64, rand_device: str = "cpu",
                 enable_fp8_attention: bool = False, progress_bar_cmd=None,
                 is_train: bool = False):
        del tiled, tile_size, tile_stride, enable_fp8_attention, \
            progress_bar_cmd
        if rand_device != "cpu":
            raise ValueError(
                "rand_device='cpu' is the only supported mode (the "
                "reference default; noise reproduces the torch CPU "
                "bitstream)")
        if is_train:
            raise NotImplementedError(
                "training preprocessing lives in train.Trainer.preprocess "
                "(the reference folds it into __call__(is_train=True); "
                "here the trainer owns the pjit train step)")
        height, width = (height + 15) // 16 * 16, (width + 15) // 16 * 16
        lat_h, lat_w = height // 8, width // 8

        sched = fm.build_schedule(
            num_inference_steps, fm.QWEN_IMAGE_CONFIG,
            denoising_strength=denoising_strength,
            dynamic_shift_len=(height // 16) * (width // 16),
            exponential_shift_mu=exponential_shift_mu)

        noise = self.generate_noise((1, lat_h, lat_w, 16), seed)
        input_latents = None
        if input_image is not None:
            input_latents = self.encode_image(input_image.resize((width, height)))
            latents = (fm.add_noise(input_latents.astype(jnp.float32),
                                    noise.astype(jnp.float32), sched.sigmas[0])
                       .astype(self.dtype))
        else:
            latents = noise

        inpaint_mask_lat = None
        if inpaint_mask is not None and input_latents is not None:
            # Latent-resolution soft mask (QwenImageUnit_Inpaint,
            # qwen_image_physical.py:714-729): mean over RGB, optional blur.
            m = inpaint_mask.convert("RGB").resize((lat_w, lat_h))
            arr = np.asarray(m, np.float32).mean(-1) / 255.0
            if inpaint_blur_size is not None and inpaint_blur_sigma is not None:
                arr = _gaussian_blur(arr, inpaint_blur_size, inpaint_blur_sigma)
            inpaint_mask_lat = jnp.asarray(arr[None, :, :, None])

        multi_edit = isinstance(edit_image, (list, tuple))
        edit_images = list(edit_image) if multi_edit else (
            [edit_image] if edit_image is not None else [])

        img_shapes = [(1, lat_h // 2, lat_w // 2)]
        token_parts = []
        if context_image is not None:
            # In-context control image at the output resolution
            # (qwen_image_physical.py:1286-1299,1347-1350).
            lat = self.encode_image(context_image.resize((width, height)))
            img_shapes.append((1, lat.shape[1] // 2, lat.shape[2] // 2))
            token_parts.append(patchify(lat))
        for im in edit_images:
            resized = (self.edit_image_auto_resize(im)
                       if edit_image_auto_resize else im)
            lat = self.encode_image(resized)
            img_shapes.append((1, lat.shape[1] // 2, lat.shape[2] // 2))
            token_parts.append(patchify(lat))
        extra_tokens = (jnp.concatenate(token_parts, axis=1)
                        if token_parts else None)

        # Vision features once per edit image, shared by the reasoner and
        # both CFG prompt rows (3 ViT runs -> 1 in the single-image path).
        vl_feats = vl_grids = None
        if edit_images:
            vl_feats, vl_grids = self._vision_features(
                [vl_host.resize_vl_image(im) for im in edit_images])

        physical_txt = ""
        if have_text_reasoning and edit_images:
            physical_txt = self.reason_physical_batch(
                [prompt], [edit_images[0]],
                vl_feats=[vl_feats[0]], vl_grids=[vl_grids[0]])[0]

        # Prompt encoding (CFG positive + negative, batched along batch).
        if multi_edit:
            emb_p, special_p = self.encode_prompt_edit_multi(
                prompt + physical_txt, edit_images)
            emb_n, special_n = self.encode_prompt_edit_multi(
                negative_prompt, edit_images)
        elif edit_images:
            (emb_p, special_p), (emb_n, special_n) = \
                self.encode_prompt_edit_batch(
                    [prompt + physical_txt, negative_prompt],
                    [edit_images[0]] * 2,
                    feats_list=[vl_feats[0]] * 2, grids=[vl_grids[0]] * 2)
        else:
            emb_p, special_p = self.encode_prompt(prompt + physical_txt)
            emb_n, special_n = self.encode_prompt(negative_prompt)

        use_cfg = cfg_scale != 1.0

        # Optional EliGen entity control: entity prompt segments are
        # prepended to the text stream with a spatial attention bias
        # (pipeline/eligen.py; reference EntityControl unit +
        # process_entity_masks).
        attn_bias = None
        txt_tables = None
        if eligen_entity_prompts and eligen_entity_masks:
            from physicedit_tpu.pipeline import eligen as EL

            entity_embs = self.encode_prompt_batch(eligen_entity_prompts)
            ent_lens = [e.shape[0] for e in entity_embs]
            offset = int(np.sum(ent_lens))
            seq_lens_p = ent_lens + [emb_p.shape[0]]
            emb_p = np.concatenate(entity_embs + [emb_p], axis=0)
            if special_p is not None:
                special_p = special_p + offset
            if use_cfg and eligen_enable_on_negative:
                nega_entities = [emb_n] * len(ent_lens)
                seq_lens_n = [e.shape[0] for e in nega_entities] + [emb_n.shape[0]]
                emb_n = np.concatenate(nega_entities + [emb_n], axis=0)
                if special_n is not None:
                    special_n = special_n + int(np.sum(seq_lens_n[:-1]))
            else:
                seq_lens_n = None

            masks_lat = [EL.downsample_entity_mask(m, lat_h, lat_w)
                         for m in eligen_entity_masks]
            base_tokens = (lat_h // 2) * (lat_w // 2)
            image_seq = base_tokens + (0 if extra_tokens is None
                                       else extra_tokens.shape[1])
            bias_p = EL.build_entity_bias(masks_lat, seq_lens_p, image_seq,
                                          base_tokens)

            # Per-segment text rope (restarts at max_vid_index per segment).
            # PER ROW: the reference runs the CFG branches as separate
            # forwards with their own rotary embeddings, so the negative
            # row (no entity segments unless eligen_enable_on_negative)
            # must get a plain, non-segmented table.
            mvi = m_rope.max_vid_index_of(img_shapes)

            def seg_tables(lens):
                cs = [m_rope.text_rope_tables(l, mvi, self.rope_axes)
                      for l in lens]
                return (np.concatenate([c for c, _ in cs]),
                        np.concatenate([s for _, s in cs]))

            txt_tables = [seg_tables(seq_lens_p)]
            if use_cfg:
                txt_tables.append(
                    seg_tables(seq_lens_n) if seq_lens_n is not None
                    else m_rope.text_rope_tables(emb_n.shape[0], mvi,
                                                 self.rope_axes))
        else:
            bias_p = None

        embs = [emb_p, emb_n] if use_cfg else [emb_p]
        specials = [special_p, special_n] if use_cfg else [special_p]
        prompt_emb, txt_mask = vl_host.bucket_pad_text(embs,
                                                      self.txt_len_bucket)
        b, s_t = txt_mask.shape

        if bias_p is not None:
            def place(bias, txt_len):
                """Re-seat an unpadded [txt+img, txt+img] bias into the
                padded joint layout [s_t + img, s_t + img]."""
                img = bias.shape[0] - txt_len
                out = np.zeros((s_t + img, s_t + img), np.float32)
                out[:txt_len, :txt_len] = bias[:txt_len, :txt_len]
                out[:txt_len, s_t:] = bias[:txt_len, txt_len:]
                out[s_t:, :txt_len] = bias[txt_len:, :txt_len]
                out[s_t:, s_t:] = bias[txt_len:, txt_len:]
                return out

            img_tok = bias_p.shape[0] - emb_p.shape[0]
            attn_bias = np.zeros((b, s_t + img_tok, s_t + img_tok), np.float32)
            attn_bias[0] = place(bias_p, emb_p.shape[0])
            if use_cfg and seq_lens_n is not None:
                bias_n = EL.build_entity_bias(masks_lat, seq_lens_n,
                                              img_tok, base_tokens)
                attn_bias[1] = place(bias_n, emb_n.shape[0])
            attn_bias = jnp.asarray(attn_bias)

        # Blockwise ControlNet conditioning (QwenImageUnit_BlockwiseControlNet
        # + blockwise_forward gating, qwen_image_physical.py:1202-1241,
        # 1389-1396).
        ctl_blocks = ctl_cond = ctl_scales = None
        if blockwise_controlnet_image is not None and self.controlnet_params is not None:
            from physicedit_tpu.models import controlnet as m_cn

            cimg = blockwise_controlnet_image.resize((width, height))
            cond_lat = self.encode_image(cimg)
            cond_tokens = patchify(cond_lat)
            ctl_cond = m_cn.process_conditioning(
                self.controlnet_params, cond_tokens.astype(self.dtype))
            ctl_cond = jnp.broadcast_to(ctl_cond, (b,) + ctl_cond.shape[1:])
            ctl_blocks = self.controlnet_params["blocks"]
            ctl_scales = jnp.asarray(m_cn.controlnet_step_scales(
                num_inference_steps, blockwise_controlnet_start,
                blockwise_controlnet_end, blockwise_controlnet_scale))

        adapter_params = self.adapters.get("visual_thinking_adapter")
        special_idx = None
        if adapter_params is not None and all(s is not None for s in specials):
            special_idx = jnp.asarray(np.stack(specials), jnp.int32)

        ropes = m_rope.build_rope_tables(
            img_shapes, s_t, edit_rope_interpolation=edit_rope_interpolation,
            axes_dim=self.rope_axes)
        if txt_tables is not None:
            def padtab(tc, ts):
                if tc.shape[0] < s_t:  # pad (masked positions)
                    padlen = s_t - tc.shape[0]
                    tc = np.concatenate(
                        [tc, np.ones((padlen, tc.shape[1]), np.float32)])
                    ts = np.concatenate(
                        [ts, np.zeros((padlen, ts.shape[1]), np.float32)])
                return tc[:s_t], ts[:s_t]

            rows = [padtab(tc, ts) for tc, ts in txt_tables]
            # [B, 1, s_t, 64]: broadcasts over heads in apply_rope, giving
            # each CFG row its own per-segment (or plain) text rope
            tc = np.stack([r[0] for r in rows])[:, None]
            ts = np.stack([r[1] for r in rows])[:, None]
            ropes = (ropes[0], ropes[1], tc, ts)

        latents = denoise(
            self.dit_params, self.dit_cfg, latents,
            None if extra_tokens is None else extra_tokens.astype(self.dtype),
            jnp.asarray(prompt_emb, self.dtype), jnp.asarray(txt_mask),
            *(jnp.asarray(r) for r in ropes),
            jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
            jnp.asarray(sched.timesteps), jnp.asarray(float(cfg_scale)),
            latent_hw=(lat_h, lat_w),
            adapter_params=adapter_params, special_idx=special_idx,
            t_min=self.t_min, t_max=self.t_max, attn_impl=self.attn_impl,
            lora=self.dit_lora, attn_bias=attn_bias,
            inpaint_mask=inpaint_mask_lat, input_latents=input_latents,
            control_blocks=ctl_blocks, control_cond=ctl_cond,
            control_scales=ctl_scales, attn_clamp=self.attn_clamp,
            cfg_truncate_after=cfg_truncate_step)

        return self.decode_image(latents)

    # ------------------------------------------------------------------
    # Batched serving
    # ------------------------------------------------------------------

    def _serving_conditioning(self, prompts: list, edit_images: list,
                              negative_prompt: str, use_cfg: bool,
                              have_text_reasoning: bool):
        """Batched serving conditioning, shared by ``edit_batch`` and
        ``edit_batch_mixed``.  Every stage here runs at a RESOLUTION-
        INDEPENDENT shape (the vision tower at the fixed VL input size,
        the reasoner at the bucketed prompt length, the 2N prompt encodes
        at the shared text bucket) — which is why mixed-resolution items
        can share one conditioning batch even though their denoises can't
        share one XLA program.

        The vision tower runs ONCE per item (features shared by the
        reasoner and both CFG prompt rows — the round-2 path ran the
        32-layer ViT 3x per item); the reasoner runs BATCHED (one prefill
        + decode for all items — the decode is weight-read-bound so N
        rows cost ~one); the 2N prompt encodes run as ONE batched
        text_forward (positives then negatives).

        Returns (prompt_emb [2N|N, S_t, D] np, txt_mask [2N|N, S_t] np,
        specials list of per-row special-token index arrays).
        """
        n = len(prompts)
        feats_list, grids = self._vision_features(
            [vl_host.resize_vl_image(im) for im in edit_images])
        physical_txts = [""] * n
        if have_text_reasoning:
            physical_txts = self.reason_physical_batch(
                prompts, edit_images, vl_feats=feats_list, vl_grids=grids)
        all_prompts = [p + t for p, t in zip(prompts, physical_txts)]
        all_images = list(edit_images)
        if use_cfg:
            all_prompts += [negative_prompt] * n
            all_images += list(edit_images)
        enc = self.encode_prompt_edit_batch(
            all_prompts, all_images, feats_list=feats_list + feats_list
            if use_cfg else feats_list,
            grids=grids + grids if use_cfg else grids)
        embs = [e for e, _ in enc]
        specials = [sp for _, sp in enc]
        prompt_emb, txt_mask = vl_host.bucket_pad_text(embs,
                                                       self.txt_len_bucket)
        return prompt_emb, txt_mask, specials

    def edit_batch_mixed(self, prompts: list, edit_images: list,
                         negative_prompt: str = "", cfg_scale: float = 4.0,
                         cfg_truncate_step: int | None = None,
                         heights: list | None = None,
                         widths: list | None = None,
                         seeds: list | None = None,
                         num_inference_steps: int = 40,
                         have_text_reasoning: bool = True,
                         edit_image_auto_resize: bool = False):
        """Edit N images of MIXED resolutions with ONE conditioning batch.

        The native-resolution PICA sweep (inference_pica.py:280-297 passes
        each image's own height/width) fragments same-resolution buckets,
        so grouping whole edits by resolution (``edit_batch``) degrades
        toward single-item conditioning.  The TPU-native fix exploits that
        only the DENOISE depends on the output resolution: conditioning
        (vision tower, reasoner decode, prompt encodes — all fixed shapes)
        runs batched across ALL N items exactly as in ``edit_batch``,
        then items group by (latent, edit-latent) shape and each group
        denoises at its own native size.  Conditioning batch-fill is 100%
        by construction regardless of the resolution mix; the denoise is
        per-item-sequential either way (one 8k-token CFG step saturates
        the chip), so fragmentation costs only XLA compiles (bounded by
        the sweep's /32 size quantisation).

        ``heights[i]``/``widths[i]`` default to item i's image size (the
        PICA native-resolution convention).  Item i uses seeds[i]
        (default: i).  Returns N PIL images in input order.
        """
        n = len(prompts)
        assert len(edit_images) == n and n >= 1
        if edit_image_auto_resize:
            edit_images = [self.edit_image_auto_resize(im)
                           for im in edit_images]
        heights = ([im.size[1] for im in edit_images] if heights is None
                   else list(heights))
        widths = ([im.size[0] for im in edit_images] if widths is None
                  else list(widths))
        assert len(heights) == n and len(widths) == n
        heights = [(h + 15) // 16 * 16 for h in heights]
        widths = [(w + 15) // 16 * 16 for w in widths]
        seeds = list(range(n)) if seeds is None else list(seeds)
        use_cfg = cfg_scale != 1.0

        # Per-item edit-image latents -> tokens [1, S_e_i, 64] (shapes may
        # differ per item; kept as a list, grouped below)
        lats, edit_hw = [], []
        for im in edit_images:
            lat = self.encode_image(im)
            lats.append(patchify(lat))
            edit_hw.append(lat.shape[1:3])

        prompt_emb, txt_mask, specials = self._serving_conditioning(
            prompts, edit_images, negative_prompt, use_cfg,
            have_text_reasoning)
        _, s_t = txt_mask.shape

        adapter_params = self.adapters.get("visual_thinking_adapter")
        use_specials = (adapter_params is not None
                        and all(s is not None for s in specials))

        # Group items by (output latent shape, edit latent shape): each
        # group is one denoise invocation at its native size.
        groups: dict = {}
        for i in range(n):
            key = (heights[i] // 8, widths[i] // 8, *edit_hw[i])
            groups.setdefault(key, []).append(i)

        results: list = [None] * n
        for (lat_h, lat_w, eh, ew), idxs in groups.items():
            m = len(idxs)
            sched = fm.build_schedule(
                num_inference_steps, fm.QWEN_IMAGE_CONFIG,
                dynamic_shift_len=(lat_h // 2) * (lat_w // 2))
            noise = jnp.concatenate(
                [self.generate_noise((1, lat_h, lat_w, 16), seeds[i])
                 for i in idxs])
            extra_tokens = jnp.concatenate(
                [lats[i] for i in idxs]).astype(self.dtype)
            rows = idxs + [n + i for i in idxs] if use_cfg else idxs
            emb_g = jnp.asarray(prompt_emb[rows], self.dtype)
            mask_g = jnp.asarray(txt_mask[rows])
            special_idx = None
            if use_specials:
                special_idx = jnp.asarray(
                    np.stack([specials[i] for i in rows]), jnp.int32)
            img_shapes = [(1, lat_h // 2, lat_w // 2), (1, eh // 2, ew // 2)]
            ropes = m_rope.build_rope_tables(img_shapes, s_t,
                                             axes_dim=self.rope_axes)
            if getattr(self, "mesh", None) is not None:
                # Same data-parallel placement as edit_batch, per shape
                # group (groups whose size doesn't divide the data axis run
                # without DP placement — GSPMD still executes them).
                from jax.sharding import NamedSharding, PartitionSpec as PS

                from physicedit_tpu.parallel import sharding as sh

                if m % self.mesh.shape[sh.DATA_AXIS] == 0:
                    dp = NamedSharding(self.mesh, PS(sh.DATA_AXIS))
                    noise = jax.device_put(noise, dp)
                    extra_tokens = jax.device_put(extra_tokens, dp)
                    emb_g = jax.device_put(emb_g, dp)
                    mask_g = jax.device_put(mask_g, dp)
                    if special_idx is not None:
                        special_idx = jax.device_put(special_idx, dp)
            latents = denoise(
                self.dit_params, self.dit_cfg, noise, extra_tokens,
                emb_g, mask_g, *(jnp.asarray(r) for r in ropes),
                jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
                jnp.asarray(sched.timesteps), jnp.asarray(float(cfg_scale)),
                latent_hw=(lat_h, lat_w),
                adapter_params=adapter_params, special_idx=special_idx,
                t_min=self.t_min, t_max=self.t_max, attn_impl=self.attn_impl,
                lora=self.dit_lora, attn_clamp=self.attn_clamp,
                cfg_truncate_after=cfg_truncate_step)
            for img, i in zip(self.decode_images(latents), idxs):
                results[i] = img
            del noise, extra_tokens, latents
        return results

    def edit_batch(self, prompts: list, edit_images: list,
                   negative_prompt: str = "", cfg_scale: float = 4.0,
                   cfg_truncate_step: int | None = None,
                   height: int = 1024, width: int = 1024,
                   seeds: list | None = None, num_inference_steps: int = 40,
                   have_text_reasoning: bool = True,
                   edit_image_auto_resize: bool = False):
        """Edit N same-resolution images in ONE denoise invocation.

        The TPU-native answer to BASELINE config #5 (batched PICABench /
        KRIS sweep): the reference shards the sweep by index range, one
        image per GPU per denoise (inference_pica.py:217-303); here the
        CFG batch carries N positives + N negatives (2N DiT rows) so the
        chip amortises dispatch and schedule glue, and on a mesh the
        batch axis is the data-parallel axis.  The caller groups images
        into same-/32-resolution buckets (eval/sweep.py).

        Item i uses seeds[i] (default: i) for its own noise; per-item
        prompts share one bucketed text length.  Returns N PIL images.
        """
        n = len(prompts)
        assert len(edit_images) == n and n >= 1
        height, width = (height + 15) // 16 * 16, (width + 15) // 16 * 16
        lat_h, lat_w = height // 8, width // 8
        seeds = list(range(n)) if seeds is None else list(seeds)

        sched = fm.build_schedule(
            num_inference_steps, fm.QWEN_IMAGE_CONFIG,
            dynamic_shift_len=(height // 16) * (width // 16))

        noise = jnp.concatenate(
            [self.generate_noise((1, lat_h, lat_w, 16), s) for s in seeds])

        # Per-item edit-image latents -> tokens [N, S_e, 64]
        img_shapes = [(1, lat_h // 2, lat_w // 2)]
        lats, shapes_seen = [], set()
        for im in edit_images:
            resized = (self.edit_image_auto_resize(im)
                       if edit_image_auto_resize else im)
            lat = self.encode_image(resized)
            lats.append(patchify(lat))
            shapes_seen.add(lat.shape[1:3])
        assert len(shapes_seen) == 1, (
            f"edit_batch requires one resolution bucket, got {shapes_seen}")
        eh, ew = next(iter(shapes_seen))
        img_shapes.append((1, eh // 2, ew // 2))
        extra_tokens = jnp.concatenate(lats, axis=0)

        prompt_emb, txt_mask, specials = self._serving_conditioning(
            prompts, edit_images, negative_prompt, cfg_scale != 1.0,
            have_text_reasoning)
        _, s_t = txt_mask.shape

        adapter_params = self.adapters.get("visual_thinking_adapter")
        special_idx = None
        if adapter_params is not None and all(s is not None for s in specials):
            special_idx = jnp.asarray(np.stack(specials), jnp.int32)

        ropes = m_rope.build_rope_tables(img_shapes, s_t,
                                         axes_dim=self.rope_axes)

        extra_tokens = extra_tokens.astype(self.dtype)
        prompt_emb = jnp.asarray(prompt_emb, self.dtype)
        txt_mask_j = jnp.asarray(txt_mask)
        if getattr(self, "mesh", None) is not None:
            # Data-parallel serving (BASELINE config #5): shard the item
            # axis over the mesh's `data` axis; GSPMD splits the denoise
            # across chips with no further code (each chip computes its
            # items' CFG pair; tensor-parallel weights compose with this).
            from jax.sharding import NamedSharding, PartitionSpec as PS

            from physicedit_tpu.parallel import sharding as sh

            n_data = self.mesh.shape[sh.DATA_AXIS]
            if n % n_data != 0:
                import warnings

                warnings.warn(
                    f"edit_batch: {n} items do not divide the data axis "
                    f"({n_data}); running WITHOUT data-parallel placement "
                    f"- pad the batch to a multiple of {n_data}")
            if n % n_data == 0:
                dp = NamedSharding(self.mesh, PS(sh.DATA_AXIS))
                noise = jax.device_put(noise, dp)
                extra_tokens = jax.device_put(extra_tokens, dp)
                prompt_emb = jax.device_put(prompt_emb, dp)
                txt_mask_j = jax.device_put(txt_mask_j, dp)
                if special_idx is not None:
                    special_idx = jax.device_put(special_idx, dp)

        latents = denoise(
            self.dit_params, self.dit_cfg, noise,
            extra_tokens,
            prompt_emb, txt_mask_j,
            *(jnp.asarray(r) for r in ropes),
            jnp.asarray(sched.sigmas), jnp.asarray(sched.sigmas_next),
            jnp.asarray(sched.timesteps), jnp.asarray(float(cfg_scale)),
            latent_hw=(lat_h, lat_w),
            adapter_params=adapter_params, special_idx=special_idx,
            t_min=self.t_min, t_max=self.t_max, attn_impl=self.attn_impl,
            lora=self.dit_lora, attn_clamp=self.attn_clamp,
            cfg_truncate_after=cfg_truncate_step)
        return self.decode_images(latents)


def _merge_lora_pytree(dit_params: dict, lora: dict, alpha: float) -> dict:
    """Fold (A, B) factors into the framework-layout DiT weights."""
    import jax.numpy as jnp

    blocks = dict(dit_params["blocks"])
    attn = dict(blocks["attn"])

    def fold(w, A, B):
        # w [L, in, out]; A [L, in, r]; B [L, r, out]
        delta = jnp.einsum("lir,lro->lio", A.astype(jnp.float32),
                           B.astype(jnp.float32)) * alpha
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    def fold_fused(w, A, B):
        # w [L, in, 3*out]; A [L, 3, in, r]; B [L, 3, r, out]
        delta = jnp.einsum("lpir,lpro->lpio", A.astype(jnp.float32),
                           B.astype(jnp.float32)) * alpha
        L, p, i, o = delta.shape
        delta = delta.transpose(0, 2, 1, 3).reshape(L, i, p * o)
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    for name in ("img_qkv", "txt_qkv"):
        attn[name] = dict(attn[name],
                          w=fold_fused(attn[name]["w"], lora[name]["A"],
                                       lora[name]["B"]))
    for name in ("to_out", "to_add_out"):
        attn[name] = dict(attn[name],
                          w=fold(attn[name]["w"], lora[name]["A"], lora[name]["B"]))
    blocks["attn"] = attn
    for mod, leaf in (("img_mod", "img_mod"), ("txt_mod", "txt_mod")):
        blocks[mod] = dict(blocks[mod],
                           w=fold(blocks[mod]["w"], lora[leaf]["A"], lora[leaf]["B"]))
    for mlp, leaf in (("img_mlp", "img_mlp_fc2"), ("txt_mlp", "txt_mlp_fc2")):
        m = dict(blocks[mlp])
        m["fc2"] = dict(m["fc2"],
                        w=fold(m["fc2"]["w"], lora[leaf]["A"], lora[leaf]["B"]))
        blocks[mlp] = m
    return dict(dit_params, blocks=blocks)


def _gaussian_blur(arr: np.ndarray, blur_size: int, sigma: float) -> np.ndarray:
    """Separable Gaussian blur (torchvision GaussianBlur equivalent with
    kernel_size = 2*blur_size + 1)."""
    k = 2 * blur_size + 1
    x = np.arange(k) - blur_size
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    pad = blur_size
    padded = np.pad(arr, ((pad, pad), (0, 0)), mode="reflect")
    arr = np.stack([np.convolve(padded[:, j], g, mode="valid")
                    for j in range(arr.shape[1])], axis=1)
    padded = np.pad(arr, ((0, 0), (pad, pad)), mode="reflect")
    arr = np.stack([np.convolve(padded[i, :], g, mode="valid")
                    for i in range(arr.shape[0])], axis=0)
    return arr


def _remap_text_encoder_keys(sd: dict) -> dict:
    """Reference converter semantics (qwen_image_text_encoder_withdecode.py:
    287-296): visual.* -> model.visual.*, model.* -> model.language_model.*."""
    out = {}
    for k, v in sd.items():
        if k.startswith("visual."):
            k = "model." + k
        elif k.startswith("model.") and not k.startswith("model.language_model.") \
                and not k.startswith("model.visual."):
            k = k.replace("model.", "model.language_model.", 1)
        out[k] = v
    return out
