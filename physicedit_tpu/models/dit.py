"""Qwen-Image MM-DiT, TPU-native.

Rebuilds the 60-block dual-stream MM-DiT of the reference
(diffsynth/models/qwen_image_dit.py:319-533) as a functional JAX model:

- parameters are a nested-dict pytree; the 60 blocks are *stacked* along a
  leading layer axis and executed with ``lax.scan`` (one compiled block body,
  fast compiles, natural per-block remat, pipeline-shardable),
- per-stream QKV projections are fused into single [dim, 3*dim] matmuls,
- RoPE cos/sin tables are precomputed host-side (ops/rope.py) and passed in,
- text padding is handled with a key-side attention mask so CFG positive /
  negative prompts batch along the batch axis (mathematically identical to
  the reference's two separate unpadded calls).

Architecture facts (qwen_image_dit.py:404-430): dim 3072, 24 heads x 128,
img_in 64->3072, txt RMSNorm(3584)+txt_in 3584->3072, per-block 6-way AdaLN
from SiLU+Linear(3072->18432), joint attention with RMSNorm(q,k) + 3D RoPE,
4x ApproximateGELU MLPs, AdaLN-single out + proj_out 3072->64.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear, linear_init, stack_trees
from physicedit_tpu.ops.attention import sdpa_bnsd
from physicedit_tpu.ops.norms import approximate_gelu, layer_norm, rms_norm
from physicedit_tpu.ops.rope import apply_rope

# Sequence-parallel (ring) attention context.  attn_impl="ring" shards the
# joint sequence over this mesh axis (parallel/ring_attention.py); set it
# once before the first traced call (the mesh is baked into the compiled
# program).
_RING_CTX = {"mesh": None, "axis": "model"}

# Fuse the AdaLN-modulate / GELU into the int8 row-quantize (one HBM pass
# per W4A8 GEMM input, kernels/fused_quant.py).  Kill switch for debugging.
import os as _os  # noqa: E402

_FUSED_ACT_QUANT = _os.environ.get("PHYSICEDIT_FUSED_ACT_QUANT", "1") != "0"


def set_ring_context(mesh, axis: str = "model"):
    _RING_CTX["mesh"] = mesh
    _RING_CTX["axis"] = axis


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    num_layers: int = 60
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    txt_in_dim: int = 3584
    patch_dim: int = 64  # 16 latent channels x 2x2 patch
    time_dim: int = 256
    eps: float = 1e-6

    @property
    def mlp_dim(self) -> int:
        return self.dim * 4


# A small configuration for tests / benches that cannot hold the 20B model.
TINY_CONFIG = DiTConfig(num_layers=2, dim=256, num_heads=4, head_dim=64,
                        txt_in_dim=128, patch_dim=64, time_dim=256)
QWEN_IMAGE_CONFIG = DiTConfig()


# ---------------------------------------------------------------------------
# Initialisation (random weights for tests; real weights come from io/)
# ---------------------------------------------------------------------------

def init_block_params(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16))
    d, hd = cfg.dim, cfg.head_dim
    return {
        "img_mod": linear_init(next(ks), d, 6 * d, dtype),
        "txt_mod": linear_init(next(ks), d, 6 * d, dtype),
        "attn": {
            "img_qkv": linear_init(next(ks), d, 3 * d, dtype),
            "txt_qkv": linear_init(next(ks), d, 3 * d, dtype),
            "norm_q": {"scale": jnp.ones((hd,), dtype)},
            "norm_k": {"scale": jnp.ones((hd,), dtype)},
            "norm_added_q": {"scale": jnp.ones((hd,), dtype)},
            "norm_added_k": {"scale": jnp.ones((hd,), dtype)},
            "to_out": linear_init(next(ks), d, d, dtype),
            "to_add_out": linear_init(next(ks), d, d, dtype),
        },
        "img_mlp": {
            "fc1": linear_init(next(ks), d, cfg.mlp_dim, dtype),
            "fc2": linear_init(next(ks), cfg.mlp_dim, d, dtype),
        },
        "txt_mlp": {
            "fc1": linear_init(next(ks), d, cfg.mlp_dim, dtype),
            "fc2": linear_init(next(ks), cfg.mlp_dim, d, dtype),
        },
    }


def init_dit_params(key, cfg: DiTConfig = QWEN_IMAGE_CONFIG, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 + cfg.num_layers))
    params = {
        "img_in": linear_init(next(ks), cfg.patch_dim, cfg.dim, dtype),
        "txt_norm": {"scale": jnp.ones((cfg.txt_in_dim,), dtype)},
        "txt_in": linear_init(next(ks), cfg.txt_in_dim, cfg.dim, dtype),
        "time_embed": {
            "linear_1": linear_init(next(ks), cfg.time_dim, cfg.dim, dtype),
            "linear_2": linear_init(next(ks), cfg.dim, cfg.dim, dtype),
        },
        "norm_out": {"linear": linear_init(next(ks), cfg.dim, 2 * cfg.dim, dtype)},
        "proj_out": linear_init(next(ks), cfg.dim, cfg.patch_dim, dtype),
        "blocks": stack_trees([init_block_params(next(ks), cfg, dtype)
                               for _ in range(cfg.num_layers)]),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def timestep_embedding(t: jax.Array, dim: int, dtype) -> jax.Array:
    """Sinusoidal timestep embedding (models/utils.py:189-216).

    flip_sin_to_cos=True, downscale_freq_shift=0, scale=1000,
    align_dtype_to_timestep=True (the frequency table is rounded through the
    compute dtype before the outer product, matching the reference).
    """
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    freqs = jnp.asarray(freqs).astype(dtype).astype(jnp.float32)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :] * 1000.0
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    return emb.astype(dtype)


def _modulate(x, shift, scale, eps):
    return layer_norm(x, eps=eps) * (1.0 + scale[:, None, :]) + shift[:, None, :]


def block_forward(p, cfg: DiTConfig, image, text, temb_silu,
                  img_cos, img_sin, txt_cos, txt_sin,
                  joint_key_mask, attn_impl: str = "xla", lora=None,
                  attn_bias=None, slim_base: int = 0,
                  attn_clamp: bool = True):
    """One dual-stream block (qwen_image_dit.py:359-401).

    image: [B, S_i, dim]; text: [B, S_t, dim]; temb_silu: [B, dim] (SiLU
    applied once outside the scan).  `lora` optionally carries this layer's
    trainable (A, B) factors (physicedit_tpu.lora layout, layer axis already
    indexed); deltas are applied on activations: y += (x @ A) @ B.
    Returns (text, image).

    slim_base > 0 runs the block as the LAST block of the stack: only the
    first `slim_base` image rows survive to the DiT output (the denoise
    loop slices them — sampling/denoise.py:111), so attention queries are
    restricted to those rows and the text stream / edit-image rows skip
    their post-attention projections and MLPs entirely (K/V still cover
    the full joint sequence; surviving rows are bit-identical).  Returns
    (None, image[:, :slim_base]).
    """
    from physicedit_tpu.lora import lora_delta, lora_delta_fused

    def lget(name):
        return lora[name] if (lora is not None and name in lora) else None

    def with_lora(y, name, x, fused=False):
        leaf = lget(name)
        if leaf is None:
            return y
        delta = (lora_delta_fused(leaf, x) if fused else lora_delta(leaf, x))
        return y + delta.astype(y.dtype)

    b, s_i, d = image.shape
    s_t = text.shape[1]
    n, hd = cfg.num_heads, cfg.head_dim

    # Fused modulate->int8 path (kernels/fused_quant.py): one HBM pass per
    # GEMM input instead of three.  Applies only to frozen packed-int4
    # weights with no LoRA factors (inference; the kernels have no VJP).
    use_fq = (_FUSED_ACT_QUANT and lora is None
              and "w4" in p["attn"]["img_qkv"]
              and p["attn"]["img_qkv"]["w4"].shape[0] % 128 == 0)

    def mod_linear(p_lin, x, shift, scale, name=None):
        """linear(p_lin, modulate(x, shift, scale)) with optional fusion.

        `name=None` for layers outside the LoRA surface (the fc1
        projections — train_multigpu.sh:30-32 trains fc2/qkv/mod/out only).
        """
        if use_fq and "w4" in p_lin:
            from physicedit_tpu.kernels.fused_quant import ln_mod_quant
            from physicedit_tpu.kernels.quant_matmul import w4a8_linear_q

            fq = ln_mod_quant(x, shift, scale, cfg.eps)
            if fq is not None:
                return w4a8_linear_q(p_lin, *fq, x.dtype)
        xn = _modulate(x, shift, scale, cfg.eps)
        y = linear(p_lin, xn)
        if name is None:
            return y
        return with_lora(y, name, xn, fused=name.endswith("qkv"))

    img_mod = with_lora(linear(p["img_mod"], temb_silu[:, None, :]),
                        "img_mod", temb_silu[:, None, :])[:, 0]
    txt_mod = with_lora(linear(p["txt_mod"], temb_silu[:, None, :]),
                        "txt_mod", temb_silu[:, None, :])[:, 0]
    im_sh1, im_sc1, im_g1, im_sh2, im_sc2, im_g2 = jnp.split(img_mod, 6, axis=-1)
    tx_sh1, tx_sc1, tx_g1, tx_sh2, tx_sc2, tx_g2 = jnp.split(txt_mod, 6, axis=-1)

    # Fused per-stream QKV projections -> heads-major [3, B, N, S, D] (one
    # transpose here, none around RoPE or the attention kernel).
    img_qkv = mod_linear(p["attn"]["img_qkv"], image, im_sh1, im_sc1,
                         "img_qkv").reshape(b, s_i, 3, n, hd)
    txt_qkv = mod_linear(p["attn"]["txt_qkv"], text, tx_sh1, tx_sc1,
                         "txt_qkv").reshape(b, s_t, 3, n, hd)
    img_qkv = img_qkv.transpose(2, 0, 3, 1, 4)
    txt_qkv = txt_qkv.transpose(2, 0, 3, 1, 4)
    iq, ik, iv = img_qkv[0], img_qkv[1], img_qkv[2]
    tq, tk, tv = txt_qkv[0], txt_qkv[1], txt_qkv[2]

    iq = rms_norm(iq, p["attn"]["norm_q"]["scale"], cfg.eps)
    ik = rms_norm(ik, p["attn"]["norm_k"]["scale"], cfg.eps)
    tq = rms_norm(tq, p["attn"]["norm_added_q"]["scale"], cfg.eps)
    tk = rms_norm(tk, p["attn"]["norm_added_k"]["scale"], cfg.eps)

    iq = apply_rope(iq, img_cos, img_sin)
    ik = apply_rope(ik, img_cos, img_sin)
    tq = apply_rope(tq, txt_cos, txt_sin)
    tk = apply_rope(tk, txt_cos, txt_sin)

    # Text prefix, image suffix on the joint sequence axis.
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)

    if slim_base:
        assert attn_impl != "ring", "slim last block is a single-chip lane"
        # queries = base image rows only (joint positions [s_t, s_t+base))
        q = q[:, :, s_t:s_t + slim_base]
        if attn_bias is not None:
            attn_bias = attn_bias[:, s_t:s_t + slim_base]

    if attn_impl == "pallas":
        from physicedit_tpu.kernels.flash_attention import flash_attention_bnsd

        out = flash_attention_bnsd(q, k, v, key_mask=joint_key_mask,
                                   bias=attn_bias, clamp=attn_clamp)
    elif attn_impl == "ring":
        from physicedit_tpu.parallel.ring_attention import ring_attention

        mesh = _RING_CTX["mesh"]
        assert mesh is not None, "call models.dit.set_ring_context(mesh) first"
        axis = _RING_CTX["axis"]
        n_sh = mesh.shape[axis]
        s_all = q.shape[2]
        pad = (-s_all) % n_sh
        mask_full = (joint_key_mask if joint_key_mask is not None
                     else jnp.ones((b, s_all), bool))
        if pad:
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            mp = jnp.pad(mask_full, ((0, 0), (0, pad)))
        else:
            qp, kp, vp, mp = q, k, v, mask_full
        # EliGen entity bias rides the ring: sharded on the query axis, key
        # chunks sliced per hop (parallel/ring_attention.py).
        bp = None if attn_bias is None else jnp.pad(
            attn_bias, ((0, 0), (0, pad), (0, pad)))
        out = ring_attention(qp, kp, vp, mp, mesh, axis=axis,
                             bias=bp)[:, :, :s_all]
    else:
        bias4 = None if attn_bias is None else attn_bias[:, None]
        out = sdpa_bnsd(q, k, v, key_mask=joint_key_mask, bias=bias4)
    def mlp(p_mlp, x, shift, scale, fc2_name):
        h_raw = mod_linear(p_mlp["fc1"], x, shift, scale)  # fc1: no LoRA
        if use_fq and "w4" in p_mlp["fc2"]:
            from physicedit_tpu.kernels.fused_quant import gelu_quant
            from physicedit_tpu.kernels.quant_matmul import w4a8_linear_q

            gq = gelu_quant(h_raw)
            if gq is not None:
                return w4a8_linear_q(p_mlp["fc2"], *gq, x.dtype)
        h = approximate_gelu(h_raw)
        return with_lora(linear(p_mlp["fc2"], h), fc2_name, h)

    if slim_base:
        # Last-block fast path: only the surviving base-image rows get
        # their output projection + MLP; the text stream and edit rows are
        # dead past this point.
        if use_fq and "w4" in p["attn"]["to_out"]:
            from physicedit_tpu.kernels.fused_quant import transpose_quant
            from physicedit_tpu.kernels.quant_matmul import w4a8_linear_q

            q_all, sc_all = transpose_quant(out)
            img_o = w4a8_linear_q(p["attn"]["to_out"], q_all, sc_all,
                                  image.dtype)
        else:
            out2 = out.transpose(0, 2, 1, 3).reshape(b, slim_base, d)
            img_o = with_lora(linear(p["attn"]["to_out"], out2),
                              "to_out", out2)
        image = image[:, :slim_base] + im_g1[:, None, :] * img_o
        image = image + im_g2[:, None, :] * mlp(
            p["img_mlp"], image, im_sh2, im_sc2, "img_mlp_fc2")
        return None, image

    fq_attn = None
    if use_fq and "w4" in p["attn"]["to_out"] \
            and "w4" in p["attn"]["to_add_out"]:
        from physicedit_tpu.kernels.fused_quant import transpose_quant

        # heads->feature transpose + row-quantize in one pass
        fq_attn = transpose_quant(out)
    if fq_attn is not None:
        from physicedit_tpu.kernels.quant_matmul import w4a8_linear_q

        q_all, sc_all = fq_attn
        img_o = w4a8_linear_q(p["attn"]["to_out"], q_all[:, s_t:],
                              sc_all[:, s_t:], image.dtype)
        txt_o = w4a8_linear_q(p["attn"]["to_add_out"], q_all[:, :s_t],
                              sc_all[:, :s_t], image.dtype)
    else:
        out = out.transpose(0, 2, 1, 3).reshape(b, s_t + s_i, d)
        txt_attn, img_attn = out[:, :s_t], out[:, s_t:]
        img_o = with_lora(linear(p["attn"]["to_out"], img_attn),
                          "to_out", img_attn)
        txt_o = with_lora(linear(p["attn"]["to_add_out"], txt_attn),
                          "to_add_out", txt_attn)

    image = image + im_g1[:, None, :] * img_o
    text = text + tx_g1[:, None, :] * txt_o

    image = image + im_g2[:, None, :] * mlp(
        p["img_mlp"], image, im_sh2, im_sc2, "img_mlp_fc2")
    text = text + tx_g2[:, None, :] * mlp(
        p["txt_mlp"], text, tx_sh2, tx_sc2, "txt_mlp_fc2")
    return text, image


def attn_clamp_needed(params, cfg: DiTConfig = None) -> bool:
    """Decide at LOAD time whether the fixed-max attention kernel needs
    its overflow CLAMP: with per-head RMS-normed q/k scaled by gammas,
    |q.k|/sqrt(d) <= sqrt(d) * |gamma_q|_inf * |gamma_k|_inf (Cauchy-
    Schwarz; RoPE rotations are norm-preserving per pair).  When that
    bound (in exp2 units) sits safely below CLAMP, the min() is
    mathematically inert and one VPU op per score element is saved in the
    hot loop.  Returns True (keep the clamp) for pathological gammas.
    """
    import numpy as np

    attn = params["blocks"]["attn"]
    gq = float(np.abs(np.asarray(attn["norm_q"]["scale"],
                                 np.float32)).max())
    gk = float(np.abs(np.asarray(attn["norm_k"]["scale"],
                                 np.float32)).max())
    gaq = float(np.abs(np.asarray(attn["norm_added_q"]["scale"],
                                  np.float32)).max())
    gak = float(np.abs(np.asarray(attn["norm_added_k"]["scale"],
                                  np.float32)).max())
    d = attn["norm_q"]["scale"].shape[-1]
    from physicedit_tpu.kernels.flash_attention import CLAMP, LOG2E

    bound = (d ** 0.5) * max(gq, gaq) * max(gk, gak) * LOG2E
    return bound >= CLAMP / 2


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "use_remat", "slim_last",
                     "attn_clamp"),
)
def dit_forward(params, cfg: DiTConfig, img_tokens, txt_tokens, timestep,
                img_cos, img_sin, txt_cos, txt_sin,
                txt_key_mask=None, attn_impl: str = "xla",
                use_remat: bool = False, lora=None, control=None,
                attn_bias=None, slim_last: int = 0,
                attn_clamp: bool = True):
    """Full DiT forward over patchified tokens.

    img_tokens: [B, S_i, 64] patchified latents (base image tokens first,
        then any edit-image tokens — the caller concatenates, mirroring
        model_fn_qwen_image at qwen_image_physical.py:1344-1355).
    txt_tokens: [B, S_t, 3584] prompt embeddings (zero-padded).
    timestep:   [B] in [0, 1] (the reference divides by 1000 before calling).
    img_cos/img_sin: [S_i, 64]; txt_cos/txt_sin: [S_t, 64] RoPE tables —
        or [B, 1, S_t, 64] for per-CFG-row text rope (EliGen segments on
        the positive row only; apply_rope broadcasts either shape).
    txt_key_mask: [B, S_t] bool, False for padded text tokens.
    slim_last: if > 0, the number of base-image tokens — the LAST block
        then computes only those rows (their outputs are the only ones the
        denoise loop keeps) and the return is [B, slim_last, 64].
        Inference-only (requires lora=None, control=None, non-ring).

    Returns [B, S_i, 64] output tokens (caller slices to the base image and
    unpatchifies), or [B, slim_last, 64] under slim_last.
    """
    b, s_i, _ = img_tokens.shape
    s_t = txt_tokens.shape[1]
    dtype = img_tokens.dtype

    image = linear(params["img_in"], img_tokens)
    text = linear(params["txt_in"],
                  rms_norm(txt_tokens, params["txt_norm"]["scale"], cfg.eps))

    temb = timestep_embedding(timestep, cfg.time_dim, dtype)
    temb = linear(params["time_embed"]["linear_2"],
                  jax.nn.silu(linear(params["time_embed"]["linear_1"], temb)))
    temb_silu = jax.nn.silu(temb)

    if txt_key_mask is None:
        joint_key_mask = None
    else:
        # Image tokens are always live: extend the text mask with a True
        # pad.  (A concatenate with a broadcasted-ones operand used to make
        # the SPMD partitioner involuntarily full-remat the mask when the
        # attention wanted it sequence-sharded; pad keeps the operand
        # sharding propagatable.)
        joint_key_mask = jnp.pad(txt_key_mask.astype(bool),
                                 ((0, 0), (0, s_i)), constant_values=True)

    body_fn = functools.partial(
        block_forward, cfg=cfg,
        img_cos=img_cos, img_sin=img_sin, txt_cos=txt_cos, txt_sin=txt_sin,
        joint_key_mask=joint_key_mask, attn_impl=attn_impl,
        attn_bias=attn_bias, attn_clamp=attn_clamp)

    def apply_block(block_params, block_lora, ctl_block, text, image):
        text, image = body_fn(block_params, image=image, text=text,
                              temb_silu=temb_silu, lora=block_lora)
        if control is not None:
            # Blockwise ControlNet residual on the base image tokens only
            # (qwen_image_physical.py:1389-1396).
            from physicedit_tpu.models.controlnet import control_block

            s_ctl = control["cond"].shape[1]
            res = control_block(ctl_block, image[:, :s_ctl], control["cond"])
            image = image.at[:, :s_ctl].add(res * control["scale"])
        return text, image

    if use_remat:
        apply_block = jax.checkpoint(apply_block)

    ctl_blocks = None if control is None else control["blocks"]

    use_slim = (slim_last > 0 and lora is None and control is None
                and attn_impl != "ring")

    def scan_body(carry, xs):
        block_params, block_lora, ctl_block = xs
        text, image = apply_block(block_params, block_lora, ctl_block, *carry)
        return (text, image), None

    if use_slim:
        # Per-iteration dynamic indexing on the ORIGINAL stacked tree — a
        # tree_map slice of blocks[:-1] would materialise a near-full copy
        # of the (10 GB quantized) weights and OOM the chip.
        def loop_body(i, carry):
            bp = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0,
                                                       keepdims=False),
                params["blocks"])
            return apply_block(bp, None, None, *carry)

        text, image = jax.lax.fori_loop(0, cfg.num_layers - 1, loop_body,
                                        (text, image))
        last = jax.tree_util.tree_map(lambda x: x[-1], params["blocks"])
        _, image = body_fn(last, image=image, text=text,
                           temb_silu=temb_silu, slim_base=slim_last)
    else:
        (text, image), _ = jax.lax.scan(
            scan_body, (text, image), (params["blocks"], lora, ctl_blocks))

    # AdaLN-single out (models/utils.py:296-309): scale, shift = chunk(2).
    mod = linear(params["norm_out"]["linear"], temb_silu)
    scale, shift = jnp.split(mod, 2, axis=-1)
    image = layer_norm(image, eps=1e-6) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return linear(params["proj_out"], image)
