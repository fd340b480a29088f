"""Full-depth W4A8-vs-bf16 divergence lane (VERDICT r4 #1).

Measures the CUMULATIVE latent divergence of the production W4A8 serving
path against a bf16 oracle over a real 40-step CFG denoise through all 60
DiT blocks — the quality bound of the quantized headline config that is
measurable without real weights (random init is the documented proxy; the
real-weight LPIPS procedure is tools/capture_goldens.py, docs/REAL_WEIGHTS.md).
Reference bar: bf16 end-to-end (scripts/inference/validate.py:95).

The 20B bf16 tree (40.7 GB) cannot live on a 16 GB chip and the tunnelled
host link (~1.4 GB/s) rules out streaming it 40x.  Since the weights are
random anyway, each block's bf16 parameters are REGENERATED ON-CHIP inside
the layer scan from a per-block PRNG key (models/dit.init_block_params is
pure), so the oracle holds exactly one block's weights at a time and every
quantized lane quantizes the SAME regenerated weights in-graph
(kernels/quant_matmul.quantize_weight_int4 — bit-identical to what
quantize_tree_int4 produces at load time).

Lanes (each one full 40-step trajectory, per-step latents fetched):
  - oracle      : bf16 everywhere (the reference numeric path)
  - all         : production W4A8 (every leaf quantize_tree_int4 touches)
  - one-group   : int4 on a single leaf group (mod / qkv / attn_out /
                  fc1 / fc2 / outer) — the per-layer-type sensitivity map
  - mixed       : int4 everywhere except chosen groups in int8 (W8A8,
                  ops/quant.py) — the mixed-precision fallback candidates
  - cfg-truncate: the production W4A8 path with positive-only late steps
                  (sampling/denoise.py cfg_truncate_after), swept over k —
                  divergence is measured against the FULL-CFG W4A8 lane,
                  i.e. exactly what opting into --cfg_truncate_step changes.

Per-step curves (rel L2 + cosine vs the oracle trajectory at the same step
index) merge into BENCH_DETAIL.json under "quant_divergence" via
bench._write_detail.  Adapters / ControlNet are bf16 in production and are
identical functions of (text, t) in both lanes, so they are omitted here.

Usage:
  python tools/quant_divergence.py --out BENCH_DETAIL.json \
      [--res 1024] [--steps 40] [--lanes all,sens,mixed,trunc]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import jax.numpy as jnp

from physicedit_tpu.core.params import linear
from physicedit_tpu.models import dit as jdit
from physicedit_tpu.ops.norms import rms_norm, layer_norm
from physicedit_tpu.ops import rope as jrope
from physicedit_tpu.ops.patchify import patchify, unpatchify
from physicedit_tpu.sampling.flow_match import qwen_inference_schedule


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Leaf groups of one DiT block (plus "outer" for the embed/head layers).
# Paths match models/dit.init_block_params; every leaf here is large
# enough that quantize_tree_int4 (min_size 1<<16) quantizes it in the
# production tree.
BLOCK_GROUPS = {
    "mod": (("img_mod",), ("txt_mod",)),
    "qkv": (("attn", "img_qkv"), ("attn", "txt_qkv")),
    "attn_out": (("attn", "to_out"), ("attn", "to_add_out")),
    "fc1": (("img_mlp", "fc1"), ("txt_mlp", "fc1")),
    "fc2": (("img_mlp", "fc2"), ("txt_mlp", "fc2")),
}
OUTER_PATHS = (("img_in",), ("txt_in",), ("time_embed", "linear_1"),
               ("time_embed", "linear_2"), ("norm_out", "linear"),
               ("proj_out",))
ALL_GROUPS = tuple(sorted(BLOCK_GROUPS)) + ("outer",)


def _quantize_leaf(leaf: dict, mode: str) -> dict:
    """'w' leaf -> int4-packed / int8 form, preserving bias etc."""
    if mode == "bf16":
        return leaf
    if mode == "int4":
        from physicedit_tpu.kernels.quant_matmul import quantize_weight_int4

        q = dict(quantize_weight_int4(leaf["w"]))
    elif mode == "int8":
        from physicedit_tpu.ops.quant import quantize_weight

        q = dict(quantize_weight(leaf["w"]))
    else:
        raise ValueError(mode)
    for k, v in leaf.items():
        if k != "w":
            q[k] = v
    return q


def _apply_spec_block(block: dict, spec: dict) -> dict:
    """Quantize one block's leaves per {group: mode} spec (pure/jittable)."""
    out = {k: v for k, v in block.items()}

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node[p] = {k: v for k, v in node[p].items()}
            node = node[p]
        node[path[-1]] = value

    for group, paths in BLOCK_GROUPS.items():
        mode = spec.get(group, "bf16")
        if mode == "bf16":
            continue
        for path in paths:
            node = block
            for p in path:
                node = node[p]
            set_path(out, path, _quantize_leaf(node, mode))
    return out


def make_spec(int4_groups=(), int8_groups=()):
    spec = {g: "bf16" for g in ALL_GROUPS}
    for g in int4_groups:
        spec[g] = "int4"
    for g in int8_groups:
        spec[g] = "int8"
    return spec


def _spec_key(spec):
    return tuple(sorted(spec.items()))


@functools.partial(jax.jit, static_argnames=("cfg", "spec_key", "latent_hw",
                                             "cfg_scale", "attn_impl"))
def _step_fn(block_keys, outer, cfg, latents, extra_tokens, txt,
             tables, sigma, sigma_next, cfg_on, spec_key,
             latent_hw, cfg_scale=4.0, attn_impl="pallas"):
    """ONE denoise step; returns the next latents [1, h, w, 16].

    Mirrors sampling/denoise.py's step math (patchify -> DiT -> CFG combine
    -> Euler in f32) with the DiT forward inlined so each block's weights
    are regenerated from ``block_keys[i]`` and quantized per ``spec_key``
    inside the layer scan (dit_forward structure, models/dit.py:379-484).
    ``cfg_on``: scalar bool — False takes the positive row's velocity only
    (the --cfg_truncate_step math, sampling/denoise.py:162-181).

    Jitted per step (the host loops over steps, fetching each latent) —
    the round-5 first cut jitted the whole 40-step trajectory with the
    regen+quantize scan inlined and crashed the tunnelled TPU worker
    after ~1 h without completing its compile+run; per-step programs keep
    the XLA program a 60-block scan and give per-step progress.
    """
    spec = dict(spec_key)
    h, w = latent_hw
    img_cos, img_sin, txt_cos, txt_sin = tables
    dtype = txt.dtype
    b = txt.shape[0]
    mask = None  # all text tokens live (divergence lane uses full rows)

    def forward(img_tokens, timestep):
        image = linear(outer["img_in"], img_tokens)
        text = linear(outer["txt_in"],
                      rms_norm(txt, outer["txt_norm"]["scale"], cfg.eps))
        temb = jdit.timestep_embedding(timestep, cfg.time_dim, dtype)
        temb = linear(outer["time_embed"]["linear_2"],
                      jax.nn.silu(linear(outer["time_embed"]["linear_1"],
                                         temb)))
        temb_silu = jax.nn.silu(temb)

        def body(carry, key):
            text, image = carry
            block = jdit.init_block_params(key, cfg, dtype)
            # Commit the regenerated weights to bf16 before use: without
            # the barrier XLA fuses the f32 RNG internals straight into the
            # consuming dots, skipping the bf16 round-trip the stored-params
            # path has (observed as ~2-LSB output drift vs dit_forward).
            block = jax.lax.optimization_barrier(block)
            block = _apply_spec_block(block, spec)
            text, image = jdit.block_forward(
                block, cfg, image, text, temb_silu,
                img_cos, img_sin, txt_cos, txt_sin,
                joint_key_mask=mask, attn_impl=attn_impl, attn_clamp=False)
            return (text, image), None

        (text, image), _ = jax.lax.scan(body, (text, image), block_keys)
        mod = linear(outer["norm_out"]["linear"], temb_silu)
        scale, shift = jnp.split(mod, 2, axis=-1)
        image = (layer_norm(image, eps=1e-6) * (1.0 + scale[:, None, :])
                 + shift[:, None, :])
        return linear(outer["proj_out"], image)

    s_base = (h // 2) * (w // 2)

    img_tokens = patchify(latents.astype(dtype))
    img_tokens = jnp.concatenate([img_tokens, extra_tokens], axis=1)
    img_tokens = jnp.tile(img_tokens, (b, 1, 1))
    t_norm = jnp.broadcast_to(sigma, (b,)).astype(dtype)
    out = forward(img_tokens, t_norm)[:, :s_base]
    v = unpatchify(out, h, w)
    v_posi, v_nega = v[:1], v[1:]
    v_cfg = v_nega + cfg_scale * (v_posi - v_nega)
    v = jnp.where(cfg_on, v_cfg, v_posi)
    return (latents.astype(jnp.float32)
            + v.astype(jnp.float32) * (sigma_next - sigma)
            ).astype(latents.dtype)


class DivergenceLane:
    """Shared inputs + per-spec trajectory runner."""

    def __init__(self, res=512, steps=40, seed=0, cfg=None,
                 attn_impl="pallas", axes_dim=None):
        self.cfg = jdit.QWEN_IMAGE_CONFIG if cfg is None else cfg
        self.attn_impl = attn_impl
        self.axes_dim = jrope.AXES_DIM if axes_dim is None else axes_dim
        self.steps = steps
        dtype = jnp.bfloat16
        lat = res // 8
        self.latent_hw = (lat, lat)
        grid = lat // 2
        s_t = 256
        sched = qwen_inference_schedule(steps, res, res)
        self.sigmas = jnp.asarray(sched.sigmas)
        self.sigmas_next = jnp.asarray(sched.sigmas_next)

        key = jax.random.PRNGKey(seed)
        k_blocks, k_outer, k_lat, k_extra, k_txt = jax.random.split(key, 5)
        self.block_keys = jax.random.split(k_blocks, self.cfg.num_layers)
        # outer layers: generated once (bf16), quantized per spec lazily
        ks = iter(jax.random.split(k_outer, 8))
        from physicedit_tpu.core.params import linear_init

        c = self.cfg
        self.outer_bf16 = {
            "img_in": linear_init(next(ks), c.patch_dim, c.dim, dtype),
            "txt_norm": {"scale": jnp.ones((c.txt_in_dim,), dtype)},
            "txt_in": linear_init(next(ks), c.txt_in_dim, c.dim, dtype),
            "time_embed": {
                "linear_1": linear_init(next(ks), c.time_dim, c.dim, dtype),
                "linear_2": linear_init(next(ks), c.dim, c.dim, dtype),
            },
            "norm_out": {"linear": linear_init(next(ks), c.dim, 2 * c.dim,
                                               dtype)},
            "proj_out": linear_init(next(ks), c.dim, c.patch_dim, dtype),
        }
        self.latents0 = (jax.random.normal(k_lat, (1, lat, lat, 16))
                         .astype(dtype))
        self.extra = (jax.random.normal(k_extra, (1, grid * grid, 64)) * 0.3
                      ).astype(dtype)
        self.txt = (jax.random.normal(k_txt, (2, s_t, c.txt_in_dim)) * 0.5
                    ).astype(dtype)
        self.tables = tuple(map(jnp.asarray, jrope.build_rope_tables(
            [(1, grid, grid), (1, grid, grid)], s_t,
            axes_dim=self.axes_dim)))
        self.full_cfg = jnp.ones((steps,), bool)

    def _outer_for(self, spec):
        mode = spec.get("outer", "bf16")
        if mode == "bf16":
            return self.outer_bf16
        out = {k: v for k, v in self.outer_bf16.items()}
        for path in OUTER_PATHS:
            node = self.outer_bf16
            for p in path:
                node = node[p]
            tgt = out
            for p in path[:-1]:
                tgt[p] = {k: v for k, v in tgt[p].items()}
                tgt = tgt[p]
            tgt[path[-1]] = _quantize_leaf(node, mode)
        return out

    def run(self, spec, use_cfg=None, tag=""):
        """One full denoise trajectory: host loop over per-step jitted
        programs, fetching each step's latents -> [T, h, w, 16] f32."""
        use_cfg = self.full_cfg if use_cfg is None else use_cfg
        use_cfg = np.asarray(use_cfg)
        t0 = time.perf_counter()
        outer = self._outer_for(spec)
        lat = self.latents0
        traj = np.empty((self.steps, *self.latent_hw, 16), np.float32)
        for t in range(self.steps):
            lat = _step_fn(self.block_keys, outer, self.cfg, lat,
                           self.extra, self.txt, self.tables,
                           self.sigmas[t], self.sigmas_next[t],
                           bool(use_cfg[t]), _spec_key(spec),
                           self.latent_hw, attn_impl=self.attn_impl)
            traj[t] = np.asarray(lat[0], np.float32)
            if t == 0:
                log(f"  lane {tag or _spec_key(spec)}: compile+step0 "
                    f"{time.perf_counter()-t0:.0f}s")
        log(f"  lane {tag or _spec_key(spec)}: {time.perf_counter()-t0:.0f}s "
            f"({self.steps} steps)")
        return traj


def curves(ref_traj, traj):
    """Per-step rel-L2 and cosine of traj vs ref_traj ([T, h, w, 16])."""
    rel, cos = [], []
    for t in range(ref_traj.shape[0]):
        a, b = ref_traj[t].ravel(), traj[t].ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        rel.append(float(np.linalg.norm(b - a) / max(na, 1e-12)))
        cos.append(float((a @ b) / max(na * nb, 1e-12)))
    return {"rel_l2": rel, "cosine": cos}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512,
                help="divergence is measured at a reduced sequence "
                     "(512-sq default): per-block relative quantization "
                     "error is sequence-independent to first order, and "
                     "the bf16 oracle at 1024-sq exceeded what the "
                     "tunnelled single chip sustains")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default=None,
                    help="merge results into this detail artifact "
                         "(e.g. BENCH_DETAIL.json)")
    ap.add_argument("--lanes", default="all",
                    help="comma list: all | sens | mixed:<g8>[+g8] | "
                         "trunc:<k>[,k...]  (oracle + W4A8 always run)")
    ap.add_argument("--json", default="/tmp/quant_divergence.json")
    args = ap.parse_args()

    lane = DivergenceLane(res=args.res, steps=args.steps)
    result = {"res": args.res, "steps": args.steps, "blocks": 60,
              "weights": "random kaiming-uniform (docs/REAL_WEIGHTS.md has "
                         "the real-weight procedure)"}

    log("oracle (bf16, full depth)...")
    ref = lane.run(make_spec(), tag="oracle")
    log("production W4A8...")
    w4 = lane.run(make_spec(int4_groups=ALL_GROUPS), tag="w4a8")
    result["w4a8"] = curves(ref, w4)
    log(f"W4A8 final-step: rel_l2={result['w4a8']['rel_l2'][-1]:.4f} "
        f"cosine={result['w4a8']['cosine'][-1]:.5f}")

    want = args.lanes.split(",") if args.lanes else []
    if "sens" in want or "all" in want:
        sens = {}
        for g in ALL_GROUPS:
            traj = lane.run(make_spec(int4_groups=(g,)), tag=f"only-{g}")
            c = curves(ref, traj)
            sens[g] = {"rel_l2_final": c["rel_l2"][-1],
                       "cosine_final": c["cosine"][-1],
                       "rel_l2_step10": c["rel_l2"][min(9, args.steps - 1)]}
            log(f"  sensitivity {g}: final rel_l2={c['rel_l2'][-1]:.4f}")
        result["sensitivity"] = sens

    for spec_arg in want:
        if spec_arg.startswith("mixed:"):
            g8 = tuple(spec_arg.split(":", 1)[1].split("+"))
            int4 = tuple(g for g in ALL_GROUPS if g not in g8)
            traj = lane.run(make_spec(int4_groups=int4, int8_groups=g8),
                            tag=f"mixed-int8-{'+'.join(g8)}")
            result.setdefault("mixed", {})["+".join(g8)] = curves(ref, traj)
        elif spec_arg.startswith("bf16:"):
            # int4 everywhere EXCEPT the listed groups stay bf16 — the
            # keep-sensitive-leaves-unquantized fallback candidates
            keep = tuple(spec_arg.split(":", 1)[1].split("+"))
            int4 = tuple(g for g in ALL_GROUPS if g not in keep)
            traj = lane.run(make_spec(int4_groups=int4),
                            tag=f"bf16-{'+'.join(keep)}")
            result.setdefault("bf16_keep", {})["+".join(keep)] = curves(
                ref, traj)
        elif spec_arg.startswith("trunc:"):
            ks = [int(x) for x in spec_arg.split(":", 1)[1].split("+")]
            trunc = {}
            for k in ks:
                use = jnp.arange(args.steps) < k
                traj = lane.run(make_spec(int4_groups=ALL_GROUPS),
                                use_cfg=use, tag=f"trunc-k{k}")
                # vs the full-CFG W4A8 lane: exactly what opting into
                # --cfg_truncate_step changes
                c = curves(w4, traj)
                c_oracle = curves(ref, traj)
                trunc[str(k)] = {
                    "vs_w4a8": c,
                    "vs_oracle_final_rel_l2": c_oracle["rel_l2"][-1],
                    "vs_oracle_final_cosine": c_oracle["cosine"][-1],
                }
                log(f"  trunc k={k}: vs-W4A8 final rel_l2="
                    f"{c['rel_l2'][-1]:.4f}, vs-oracle "
                    f"{c_oracle['rel_l2'][-1]:.4f}")
            result["cfg_truncate"] = trunc

    with open(args.json, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {args.json}")
    if args.out:
        import bench

        bench._write_detail({"quant_divergence": result}, args.out)
        log(f"merged into {args.out}")


if __name__ == "__main__":
    main()
