"""BLOOM causal LM — the BeautifulPrompt backbone.

Rebuilds the model behind the reference's ``BeautifulPrompt`` refiner
(diffsynth/prompters/prompt_refiners.py:6-55), which loads
alibaba-pai/pai-bloom-1b1-text2prompt-sd via transformers.

Architecture (HF BloomForCausalLM semantics, modeling_bloom.py):
  - word embeddings followed by an embedding LayerNorm
  - ALiBi attention bias: per-head slopes x key position (no RoPE,
    no learned positions); slopes per build_alibi_tensor
  - pre-LN blocks: input_layernorm -> fused-QKV attention -> dense
    (+residual); post_attention_layernorm -> h->4h, gelu(tanh), 4h->h
    (+residual)
  - fused QKV weight layout is PER-HEAD interleaved: the output dim of
    query_key_value is [heads, 3, head_dim] — NOT [3, heads, head_dim]
  - final ln_f; lm_head tied to the word embeddings

TPU-native: stacked layers under ``lax.scan``; greedy/sampled decode uses
fixed-shape K/V slabs + ``dynamic_update_slice`` in a scan.  Sampling
implements the reference's generate kwargs (temperature / top-k / top-p /
repetition_penalty) as pure-JAX logit transforms.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from physicedit_tpu.core.params import linear
from physicedit_tpu.ops.norms import layer_norm

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab_size: int
    hidden_size: int = 1536
    num_layers: int = 24
    num_heads: int = 16
    eos_token_id: int = 2
    pad_token_id: int = 3
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


def alibi_slopes(num_heads: int) -> np.ndarray:
    """HF build_alibi_tensor slope schedule (handles non-power-of-2)."""
    cp2 = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = base ** np.arange(1, 1 + cp2, dtype=np.float64)
    if cp2 != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        n_rem = min(cp2, num_heads - cp2)
        extra = extra_base ** np.arange(1, 1 + 2 * n_rem, 2, dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _attention(p, cfg: BloomConfig, x, alibi, bias, kv=None, pos=None):
    """x: [B,S,D]. alibi: [B, H, 1, Smax] (slope * per-row mask-aware
    key position).

    Without kv: full (prefill/teacher-forced) pass over S keys.
    With kv ({k,v}: [B,Smax,H,Hd]) and pos: single-token decode step.
    """
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    qkv = linear(p["qkv"], x).reshape(b, s, n, 3, hd)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    if kv is not None:
        k = jax.lax.dynamic_update_slice_in_dim(kv["k"], k, pos, axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(kv["v"], v, pos, axis=1)
    sk = k.shape[1]
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
    scores = scores * (hd ** -0.5) + alibi[:, :, :, :sk] + bias
    a = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", a, v).reshape(b, s, d)
    out = linear(p["dense"], out)
    if kv is not None:
        return out, {"k": k, "v": v}
    return out


def _block(p, cfg: BloomConfig, x, alibi, bias, kv=None, pos=None):
    h = layer_norm(x, cfg.eps, p["ln1"]["scale"], p["ln1"]["bias"])
    if kv is None:
        x = x + _attention(p, cfg, h, alibi, bias)
    else:
        attn, kv = _attention(p, cfg, h, alibi, bias, kv, pos)
        x = x + attn
    h = layer_norm(x, cfg.eps, p["ln2"]["scale"], p["ln2"]["bias"])
    x = x + linear(p["fc2"], _gelu_tanh(linear(p["fc1"], h)))
    return (x, kv) if kv is not None else x


def _alibi_bias(params, cfg: BloomConfig, attn_mask):
    """[B,H,1,S] slope*position table using HF's mask-aware positions
    (build_alibi_tensor: per-ROW cumulative positions, so batched calls
    with different per-row prompt lengths bias correctly)."""
    slopes = params["alibi_slopes"]  # [H]
    pos = (jnp.cumsum(attn_mask, -1) - 1) * attn_mask  # [B,S]
    return (slopes[None, :, None, None]
            * pos[:, None, None, :].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def bloom_logits(params, cfg: BloomConfig, input_ids, attn_mask):
    """Teacher-forced logits [B, S, V] (parity oracle)."""
    s = input_ids.shape[1]
    x = params["embed"][input_ids]
    x = layer_norm(x, cfg.eps, params["ln_emb"]["scale"],
                   params["ln_emb"]["bias"])
    alibi = _alibi_bias(params, cfg, attn_mask)
    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, None] & attn_mask[:, None, None, :].astype(bool)
    bias = jnp.where(keep, 0.0, NEG_INF)

    def body(carry, lp):
        return _block(lp, cfg, carry, alibi, bias), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, cfg.eps, params["ln_f"]["scale"], params["ln_f"]["bias"])
    return x @ params["embed"].T.astype(x.dtype)


def _apply_rep_penalty(logits, counts, penalty):
    """HF repetition_penalty: seen tokens' logits /p if >0 else *p."""
    seen = counts > 0
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def _top_k_top_p(logits, top_k: int, top_p: float):
    """HF TopK then TopP warpers (filter to -inf)."""
    v = logits.shape[-1]
    if 0 < top_k < v:
        kth = jnp.sort(logits, axis=-1)[..., v - top_k][..., None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (first always kept)
        keep_sorted = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep_sorted, srt, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return logits


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "do_sample", "top_k", "top_p", "temperature",
    "repetition_penalty"))
def bloom_generate(params, cfg: BloomConfig, input_ids, attn_mask,
                   max_new_tokens: int = 384, do_sample: bool = False,
                   temperature: float = 1.0, top_k: int = 0,
                   top_p: float = 1.0, repetition_penalty: float = 1.0,
                   rng: jax.Array | None = None):
    """Generate continuations; returns [B, max_new_tokens] (pad after EOS).

    Mirrors the BeautifulPrompt generate call (prompt_refiners.py:36-45):
    do_sample, temperature 0.9, top_k 50, top_p 0.95, repetition_penalty 1.1.
    """
    b, s0 = input_ids.shape
    smax = s0 + max_new_tokens
    n, hd, nl = cfg.num_heads, cfg.head_dim, cfg.num_layers
    dtype = params["embed"].dtype
    if rng is None:
        rng = jax.random.PRNGKey(0)

    mask_full = jnp.concatenate(
        [attn_mask, jnp.ones((b, max_new_tokens), attn_mask.dtype)], axis=1)
    alibi = _alibi_bias(params, cfg, mask_full)  # [B,H,1,Smax] (per-row)

    # Prefill: full pass, harvest K/V into fixed slabs.
    x = params["embed"][input_ids]
    x = layer_norm(x, cfg.eps, params["ln_emb"]["scale"],
                   params["ln_emb"]["bias"])
    causal = jnp.tril(jnp.ones((s0, s0), bool))
    keep = causal[None, None] & attn_mask[:, None, None, :].astype(bool)
    bias0 = jnp.where(keep, 0.0, NEG_INF)

    kv0 = {"k": jnp.zeros((b, smax, n, hd), dtype),
           "v": jnp.zeros((b, smax, n, hd), dtype)}

    def prefill_body(x, lp):
        h = layer_norm(x, cfg.eps, lp["ln1"]["scale"], lp["ln1"]["bias"])
        qkv = linear(lp["qkv"], h).reshape(b, s0, n, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
        scores = scores * (hd ** -0.5) + alibi[:, :, :, :s0] + bias0
        a = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", a, v).reshape(b, s0, -1)
        x = x + linear(lp["dense"], out)
        h = layer_norm(x, cfg.eps, lp["ln2"]["scale"], lp["ln2"]["bias"])
        x = x + linear(lp["fc2"], _gelu_tanh(linear(lp["fc1"], h)))
        kc = jax.lax.dynamic_update_slice_in_dim(kv0["k"], k, 0, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(kv0["v"], v, 0, axis=1)
        return x, (kc, vc)

    x, (kcs, vcs) = jax.lax.scan(prefill_body, x, params["layers"])
    x = layer_norm(x, cfg.eps, params["ln_f"]["scale"], params["ln_f"]["bias"])
    logits0 = x[:, -1] @ params["embed"].T.astype(x.dtype)

    counts = jnp.zeros((b, cfg.vocab_size), jnp.int32)
    counts = counts + jax.vmap(
        lambda ids, m: jnp.zeros((cfg.vocab_size,), jnp.int32).at[ids].add(
            m.astype(jnp.int32)))(input_ids, attn_mask)

    key_pos = jnp.arange(smax)

    def pick(logits, counts, rng):
        lf = logits.astype(jnp.float32)
        if repetition_penalty != 1.0:
            lf = _apply_rep_penalty(lf, counts, repetition_penalty)
        if do_sample:
            lf = lf / temperature
            lf = _top_k_top_p(lf, top_k, top_p)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, lf, axis=-1)
        else:
            nxt = jnp.argmax(lf, axis=-1)
        return nxt.astype(jnp.int32), rng

    nxt, rng = pick(logits0, counts, rng)
    done = nxt == cfg.eos_token_id
    counts = counts + jax.nn.one_hot(nxt, cfg.vocab_size, dtype=jnp.int32)

    def step(carry, pos):
        tok, kcs, vcs, counts, done, rng = carry
        x = params["embed"][tok][:, None]
        x = layer_norm(x, cfg.eps, params["ln_emb"]["scale"],
                       params["ln_emb"]["bias"])
        live = (key_pos <= pos)[None, None, None]
        bias = jnp.where(live & (mask_full[:, None, None] > 0), 0.0, NEG_INF)

        def body(x, inp):
            lp, kc, vc = inp
            (x, kv) = _block(lp, cfg, x, alibi, bias,
                             kv={"k": kc, "v": vc}, pos=pos)
            return x, (kv["k"], kv["v"])

        x, (kcs, vcs) = jax.lax.scan(body, x, (params["layers"], kcs, vcs))
        x = layer_norm(x, cfg.eps, params["ln_f"]["scale"],
                       params["ln_f"]["bias"])
        logits = x[:, 0] @ params["embed"].T.astype(x.dtype)
        nxt, rng2 = pick(logits, counts, rng)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done2 = done | (nxt == cfg.eos_token_id)
        counts = counts + jax.nn.one_hot(nxt, cfg.vocab_size, dtype=jnp.int32)
        return (nxt, kcs, vcs, counts, done2, rng2), nxt

    first = nxt
    if max_new_tokens == 1:
        return first[:, None]
    (_, _, _, _, _, _), toks = jax.lax.scan(
        step, (nxt, kcs, vcs, counts, done, rng),
        jnp.arange(s0, s0 + max_new_tokens - 1))
    return jnp.concatenate([first[:, None], toks.T], axis=1)


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------

def config_from_hf(hf_cfg) -> BloomConfig:
    return BloomConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.n_layer, num_heads=hf_cfg.n_head,
        eos_token_id=hf_cfg.eos_token_id,
        pad_token_id=getattr(hf_cfg, "pad_token_id", None)
        or hf_cfg.eos_token_id,
        eps=hf_cfg.layer_norm_epsilon)


def bloom_from_torch(sd: dict, cfg: BloomConfig, dtype=jnp.float32) -> dict:
    """HF BloomForCausalLM state_dict -> pytree.

    The fused query_key_value output dim is per-head [heads, 3, head_dim];
    we keep that exact layout so `_attention`'s reshape matches HF bitwise.
    """
    from physicedit_tpu.io.convert import _lin, _t

    base = "transformer."

    def ln(prefix):
        return {"scale": _t(sd, prefix + ".weight", dtype),
                "bias": _t(sd, prefix + ".bias", dtype)}

    def layer(i):
        p = f"{base}h.{i}"
        return {
            "ln1": ln(p + ".input_layernorm"),
            "qkv": _lin(sd, p + ".self_attention.query_key_value", dtype),
            "dense": _lin(sd, p + ".self_attention.dense", dtype),
            "ln2": ln(p + ".post_attention_layernorm"),
            "fc1": _lin(sd, p + ".mlp.dense_h_to_4h", dtype),
            "fc2": _lin(sd, p + ".mlp.dense_4h_to_h", dtype),
        }

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[layer(i) for i in range(cfg.num_layers)])
    return {
        "embed": _t(sd, base + "word_embeddings.weight", dtype),
        "ln_emb": ln(base + "word_embeddings_layernorm"),
        "ln_f": ln(base + "ln_f"),
        "layers": layers,
        "alibi_slopes": jnp.asarray(alibi_slopes(cfg.num_heads)),
    }
