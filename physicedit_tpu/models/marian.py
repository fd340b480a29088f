"""MarianMT encoder-decoder (opus-mt) — the prompt-Translator backbone.

Rebuilds the model behind the reference's ``Translator`` prompt refiner
(diffsynth/prompters/prompt_refiners.py:118-130), which loads
Helsinki-NLP/opus-mt-zh-en via transformers and calls ``model.generate``.

Architecture (HF MarianMTModel semantics, modeling_marian.py):
  - shared token embedding, scaled by sqrt(d_model) when scale_embedding
  - non-learned sinusoidal position table (sin half then cos half,
    NOT interleaved — MarianSinusoidalPositionalEmbedding._init_weight)
  - post-LN transformer: LayerNorm AFTER each residual add
  - encoder: self-attn -> LN -> ffn -> LN
  - decoder: causal self-attn -> LN -> cross-attn over encoder -> LN ->
    ffn -> LN
  - lm_head = shared embedding transposed + final_logits_bias

TPU-native choices: layers are stacked pytrees run under ``lax.scan``;
greedy decode keeps K/V caches as fixed-shape slabs updated with
``dynamic_update_slice`` inside one scan (static shapes, no Python loop);
cross-attention K/V are projected once per generation, not per token.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops.norms import layer_norm

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class MarianConfig:
    vocab_size: int
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_positions: int = 512
    scale_embedding: bool = True
    activation: str = "swish"  # opus-mt: "swish" (= silu)
    pad_token_id: int = 0
    eos_token_id: int = 0
    decoder_start_token_id: int = 0  # Marian: equals pad_token_id
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.d_model // self.num_heads

    @property
    def embed_scale(self):
        return float(np.sqrt(self.d_model)) if self.scale_embedding else 1.0


def _act(name: str):
    return {"swish": jax.nn.silu, "silu": jax.nn.silu,
            "gelu": functools.partial(jax.nn.gelu, approximate=False),
            "relu": jax.nn.relu}[name]


def sinusoidal_table(n_pos: int, dim: int) -> np.ndarray:
    """HF Marian layout: sin features in [:, :ceil(dim/2)], cos after."""
    pos = np.arange(n_pos)[:, None]
    j = np.arange(dim)[None, :]
    enc = pos / np.power(10000.0, 2 * (j // 2) / dim)
    sentinel = dim // 2 if dim % 2 == 0 else dim // 2 + 1
    out = np.empty((n_pos, dim), np.float32)
    out[:, :sentinel] = np.sin(enc[:, 0::2])
    out[:, sentinel:] = np.cos(enc[:, 1::2])
    return out


def _heads(x, n, hd):
    b, s, _ = x.shape
    return x.reshape(b, s, n, hd)


def _mha(p, cfg: MarianConfig, q_x, kv_x, bias):
    """Standard MHA; bias is additive [B, 1|H, Sq, Sk] or None."""
    n, hd = cfg.num_heads, cfg.head_dim
    q = _heads(linear(p["q"], q_x), n, hd) * (hd ** -0.5)
    k = _heads(linear(p["k"], kv_x), n, hd)
    v = _heads(linear(p["v"], kv_x), n, hd)
    s = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
    if bias is not None:
        s = s + bias
    a = jax.nn.softmax(s, axis=-1).astype(q_x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", a, v)
    return linear(p["o"], out.reshape(q_x.shape))


def _ffn(p, cfg: MarianConfig, x):
    return linear(p["fc2"], _act(cfg.activation)(linear(p["fc1"], x)))


def _post_ln(p, cfg, x):
    return layer_norm(x, cfg.eps, p["scale"], p["bias"])


def _encoder_layer(p, cfg: MarianConfig, x, bias):
    x = _post_ln(p["ln1"], cfg, x + _mha(p["attn"], cfg, x, x, bias))
    return _post_ln(p["ln2"], cfg, x + _ffn(p, cfg, x))


@functools.partial(jax.jit, static_argnames=("cfg",))
def marian_encode(params, cfg: MarianConfig, input_ids, attn_mask):
    """input_ids, attn_mask: [B, S] -> encoder hidden [B, S, D]."""
    emb = params["embed"]
    x = emb[input_ids] * jnp.asarray(cfg.embed_scale, emb.dtype)
    x = x + params["pos"][: input_ids.shape[1]].astype(x.dtype)
    bias = jnp.where(attn_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def body(carry, lp):
        return _encoder_layer(lp, cfg, carry, bias), None

    x, _ = jax.lax.scan(body, x, params["enc_layers"])
    return x


def _decoder_layer(p, cfg: MarianConfig, x, self_bias, enc_h, enc_bias):
    x = _post_ln(p["ln1"], cfg, x + _mha(p["attn"], cfg, x, x, self_bias))
    x = _post_ln(p["ln2"], cfg, x + _mha(p["cross"], cfg, x, enc_h, enc_bias))
    return _post_ln(p["ln3"], cfg, x + _ffn(p, cfg, x))


@functools.partial(jax.jit, static_argnames=("cfg",))
def marian_decode_logits(params, cfg: MarianConfig, decoder_ids, enc_hidden,
                         enc_mask):
    """Teacher-forced decoder pass -> logits [B, S_dec, V] (parity oracle)."""
    emb = params["embed"]
    s = decoder_ids.shape[1]
    x = emb[decoder_ids] * jnp.asarray(cfg.embed_scale, emb.dtype)
    x = x + params["pos"][:s].astype(x.dtype)
    causal = jnp.where(
        jnp.tril(jnp.ones((s, s), bool))[None, None], 0.0, NEG_INF)
    enc_bias = jnp.where(enc_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def body(carry, lp):
        return _decoder_layer(lp, cfg, carry, causal, enc_hidden, enc_bias), None

    x, _ = jax.lax.scan(body, x, params["dec_layers"])
    return (x @ emb.T.astype(x.dtype)) + params["final_logits_bias"]


def _decode_step(params, cfg: MarianConfig, tok, pos, caches, cross_kv,
                 enc_bias):
    """One greedy step. caches: per-layer stacked {k,v}: [L,B,Smax,N,Hd]."""
    n, hd = cfg.num_heads, cfg.head_dim
    emb = params["embed"]
    x = emb[tok][:, None] * jnp.asarray(cfg.embed_scale, emb.dtype)
    x = x + jax.lax.dynamic_slice_in_dim(params["pos"], pos, 1).astype(x.dtype)

    smax = caches["k"].shape[2]
    live = (jnp.arange(smax) <= pos)[None, None, None]
    self_bias = jnp.where(live, 0.0, NEG_INF)

    def body(x, inp):
        lp, kc, vc, ck, cv = inp
        h = x
        q = _heads(linear(lp["attn"]["q"], h), n, hd) * (hd ** -0.5)
        k1 = _heads(linear(lp["attn"]["k"], h), n, hd)
        v1 = _heads(linear(lp["attn"]["v"], h), n, hd)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k1, pos, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v1, pos, axis=1)
        s = jnp.einsum("bqnd,bknd->bnqk", q, kc).astype(jnp.float32) + self_bias
        a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", a, vc).reshape(h.shape)
        x = _post_ln(lp["ln1"], cfg, x + linear(lp["attn"]["o"], o))
        q = _heads(linear(lp["cross"]["q"], x), n, hd) * (hd ** -0.5)
        s = jnp.einsum("bqnd,bknd->bnqk", q, ck).astype(jnp.float32) + enc_bias
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", a, cv).reshape(x.shape)
        x = _post_ln(lp["ln2"], cfg, x + linear(lp["cross"]["o"], o))
        x = _post_ln(lp["ln3"], cfg, x + _ffn(lp, cfg, x))
        return x, (kc, vc)

    x, (kcs, vcs) = jax.lax.scan(
        body, x, (params["dec_layers"], caches["k"], caches["v"],
                  cross_kv["k"], cross_kv["v"]))
    logits = (x[:, 0] @ emb.T.astype(x.dtype)) + params["final_logits_bias"][0]
    return logits, {"k": kcs, "v": vcs}


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def marian_greedy_generate(params, cfg: MarianConfig, input_ids, attn_mask,
                           max_new_tokens: int = 512):
    """HF-generate parity: encode, start at decoder_start, greedy to EOS.

    Returns [B, max_new_tokens] token ids; positions after EOS are padded
    with pad_token_id (HF pads finished rows the same way).
    """
    n, hd = cfg.num_heads, cfg.head_dim
    b = input_ids.shape[0]
    enc_h = marian_encode(params, cfg, input_ids, attn_mask)
    enc_bias = jnp.where(attn_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def cross(lp):
        return (_heads(linear(lp["cross"]["k"], enc_h), n, hd),
                _heads(linear(lp["cross"]["v"], enc_h), n, hd))

    ck, cv = jax.vmap(cross)(params["dec_layers"])
    nl = cfg.decoder_layers
    dtype = params["embed"].dtype
    caches = {
        "k": jnp.zeros((nl, b, max_new_tokens, n, hd), dtype),
        "v": jnp.zeros((nl, b, max_new_tokens, n, hd), dtype),
    }

    def step(carry, pos):
        tok, caches, done = carry
        logits, caches = _decode_step(params, cfg, tok, pos, caches,
                                      {"k": ck, "v": cv}, enc_bias)
        nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt, caches, done), nxt

    start = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
    (_, _, _), toks = jax.lax.scan(
        step, (start, caches, jnp.zeros((b,), bool)),
        jnp.arange(max_new_tokens))
    return toks.T  # [B, T]


# ---------------------------------------------------------------------------
# Converter + init
# ---------------------------------------------------------------------------

def config_from_hf(hf_cfg) -> MarianConfig:
    return MarianConfig(
        vocab_size=hf_cfg.vocab_size, d_model=hf_cfg.d_model,
        encoder_layers=hf_cfg.encoder_layers,
        decoder_layers=hf_cfg.decoder_layers,
        num_heads=hf_cfg.encoder_attention_heads,
        ffn_dim=hf_cfg.encoder_ffn_dim,
        max_positions=hf_cfg.max_position_embeddings,
        scale_embedding=hf_cfg.scale_embedding,
        activation={"swish": "swish", "silu": "swish", "gelu": "gelu",
                    "relu": "relu"}[hf_cfg.activation_function],
        pad_token_id=hf_cfg.pad_token_id, eos_token_id=hf_cfg.eos_token_id,
        decoder_start_token_id=hf_cfg.decoder_start_token_id)


def marian_from_torch(sd: dict, cfg: MarianConfig, dtype=jnp.float32) -> dict:
    """HF MarianMTModel state_dict -> pytree for this module."""
    from physicedit_tpu.io.convert import _lin, _t

    def attn(prefix):
        return {"q": _lin(sd, prefix + ".q_proj", dtype),
                "k": _lin(sd, prefix + ".k_proj", dtype),
                "v": _lin(sd, prefix + ".v_proj", dtype),
                "o": _lin(sd, prefix + ".out_proj", dtype)}

    def ln(prefix):
        return {"scale": _t(sd, prefix + ".weight", dtype),
                "bias": _t(sd, prefix + ".bias", dtype)}

    def enc_layer(i):
        p = f"model.encoder.layers.{i}"
        return {"attn": attn(p + ".self_attn"),
                "ln1": ln(p + ".self_attn_layer_norm"),
                "fc1": _lin(sd, p + ".fc1", dtype),
                "fc2": _lin(sd, p + ".fc2", dtype),
                "ln2": ln(p + ".final_layer_norm")}

    def dec_layer(i):
        p = f"model.decoder.layers.{i}"
        return {"attn": attn(p + ".self_attn"),
                "ln1": ln(p + ".self_attn_layer_norm"),
                "cross": attn(p + ".encoder_attn"),
                "ln2": ln(p + ".encoder_attn_layer_norm"),
                "fc1": _lin(sd, p + ".fc1", dtype),
                "fc2": _lin(sd, p + ".fc2", dtype),
                "ln3": ln(p + ".final_layer_norm")}

    stack = lambda layers: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: jnp.stack(xs, 0), *layers)
    pos_key = "model.encoder.embed_positions.weight"
    pos = (_t(sd, pos_key, jnp.float32) if pos_key in sd
           else jnp.asarray(sinusoidal_table(cfg.max_positions, cfg.d_model)))
    flb = (_t(sd, "final_logits_bias", jnp.float32)
           if "final_logits_bias" in sd
           else jnp.zeros((1, cfg.vocab_size), jnp.float32))
    return {
        "embed": _t(sd, "model.shared.weight", dtype),
        "pos": pos,
        "final_logits_bias": flb,
        "enc_layers": stack([enc_layer(i) for i in range(cfg.encoder_layers)]),
        "dec_layers": stack([dec_layer(i) for i in range(cfg.decoder_layers)]),
    }
