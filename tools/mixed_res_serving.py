"""Mixed-resolution (native-size) sweep-serving measurement — VERDICT r4 #3.

The committed headline measures config #5 at uniform 1024-sq, but the
reference's PICA sweep runs each edit at the image's NATIVE size
(scripts/inference/inference_pica.py:280-297 passes width/height straight
through).  This tool prices that workload for the TPU build:

1. MEASURE the 60-block W4A8 CFG denoise step at representative native
   patch grids (tools/measure_dit60.py grid= parameter), one shared
   quantized tree, each persisted to the bench stage cache as it lands.
2. FIT step(S) = a + b*S + c*S^2 over the joint sequence length S
   (GEMMs are linear in S, attention quadratic) so the simulator can
   price any /32 bucket the scenario produces.
3. SIMULATE a 900-item PICA-like arrival stream (documented approximation
   below — the dataset is not downloadable in this environment; override
   with --mix mix.json when the real histogram is available) through both
   serving modes:
     - per-bucket batching (edit_batch): whole edits group by /32 bucket;
       fragmented buckets flush partial -> conditioning loses batch depth;
     - mixed batching (edit_batch_mixed, the default): conditioning
       batches in arrival order at FULL depth regardless of resolution;
       only the per-item denoise (which never batched anyway — one 8k-token
       CFG step saturates the chip) runs per shape group.
4. Report bucket-fill efficiency + effective edits/min/chip for both
   modes, merged into BENCH_DETAIL.json under "mixed_res".

Scenario approximation (documented assumption, --mix to override): image
areas cluster at ~1 MP with photographic aspect ratios; sizes are
/32-quantised exactly as eval/sweep.py does.  The *shape* of the
conclusion (mixed batching restores full conditioning depth; throughput
then follows mean denoise cost, which the area distribution sets) holds
for any mix; the absolute edits/min shifts with the area histogram.

Usage:
  python tools/mixed_res_serving.py [--skip-measure] [--out BENCH_DETAIL.json]
      [--mix mix.json] [--items 900] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Grids measured on-chip: (gh, gw) = (H/16, W/16).  Chosen to span the
# joint-sequence range the scenario produces (S = 2*gh*gw + 256).
MEASURE_GRIDS = ((64, 64), (48, 64), (84, 48), (32, 32), (56, 72))

# PICA-approximation resolution mix: (weight, aspect w/h, area px).
# Documented assumption — see module docstring.  Areas ~1 MP with a small
# and a large tail; aspects are the common photo/benchmark ratios.
DEFAULT_MIX = [
    {"weight": 0.30, "aspect": 1.0, "area": 1024 * 1024},
    {"weight": 0.15, "aspect": 4 / 3, "area": 1024 * 1024},
    {"weight": 0.15, "aspect": 3 / 4, "area": 1024 * 1024},
    {"weight": 0.10, "aspect": 16 / 9, "area": 1024 * 1024},
    {"weight": 0.10, "aspect": 9 / 16, "area": 1024 * 1024},
    {"weight": 0.10, "aspect": 1.0, "area": 640 * 640},
    {"weight": 0.05, "aspect": 4 / 3, "area": 768 * 768},
    {"weight": 0.05, "aspect": 1.0, "area": 1280 * 1280},
]
# Per-item size jitter (multiplicative, on each dimension before /32
# quantisation): real benchmarks are not exactly on the class sizes, and
# the jitter is what fragments /32 buckets for the per-bucket mode.
JITTER = 0.08


def joint_tokens(gh: int, gw: int, s_t: int = 256) -> int:
    """Joint DiT sequence: base + edit image tokens + text rows."""
    return 2 * gh * gw + s_t


def sample_stream(mix, n_items: int, seed: int = 0):
    """Sample n_items native sizes -> /32-quantised (w, h) px, arrival
    order randomised (PICA iterates dataset order; resolution is i.i.d.
    w.r.t. index for our purposes)."""
    rng = np.random.default_rng(seed)
    weights = np.asarray([m["weight"] for m in mix], np.float64)
    weights = weights / weights.sum()
    classes = rng.choice(len(mix), size=n_items, p=weights)
    sizes = []
    for c in classes:
        m = mix[c]
        w = math.sqrt(m["area"] * m["aspect"])
        h = w / m["aspect"]
        jw, jh = rng.normal(1.0, JITTER, 2)
        w = max(256, int(w * jw) // 32 * 32)
        h = max(256, int(h * jh) // 32 * 32)
        sizes.append((w, h))
    return sizes


def fit_step_model(measured: dict):
    """measured: {(gh, gw): step_s} -> least-squares (a, b, c) of
    step_s = a + b*S + c*S^2."""
    pts = [(joint_tokens(gh, gw), s) for (gh, gw), s in measured.items()]
    S = np.asarray([p[0] for p in pts], np.float64)
    y = np.asarray([p[1] for p in pts], np.float64)
    A = np.stack([np.ones_like(S), S, S * S], axis=1)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = A @ coef - y
    rel = float(np.abs(resid / y).max())
    return coef, rel


def step_at(coef, gh: int, gw: int) -> float:
    s = joint_tokens(gh, gw)
    return float(coef[0] + coef[1] * s + coef[2] * s * s)


def _amortised(total_1: float, total_8_per_item: float, m: int) -> float:
    """Per-item time at batch depth m from two measured points, modeling
    total(m) = a + b*m (launch glue + per-item compute):
    total(1)=total_1, total(8)=8*total_8_per_item."""
    b = (8.0 * total_8_per_item - total_1) / 7.0
    a = total_1 - b
    return (a + b * m) / m


def _tok_at(vl: dict, m: int) -> float:
    """Per-token decode total time at batch depth m: piecewise-linear in m
    between the measured ladder points (vl: {b: (prefill_s, tok_s)})."""
    bs = sorted(vl)
    if m <= bs[0]:
        return vl[bs[0]][1]
    for lo, hi in zip(bs, bs[1:]):
        if m <= hi:
            f = (m - lo) / (hi - lo)
            return vl[lo][1] + f * (vl[hi][1] - vl[lo][1])
    return vl[bs[-1]][1]


def cond_per_item(m: int, vl: dict, stage: dict,
                  max_tokens: int = 1000) -> float:
    """Conditioning seconds/item for a flush of m items (the bench
    compose_serving math generalised to partial depth): per-row chunk-1
    reasoner prefills, ceil(2m/4) prompt-encode chunks, batched decode at
    depth m, vision/VAE at amortised depth m."""
    pre1 = vl[1][0]
    pre4 = vl.get(4, (2 * vl[2][0], None))[0]
    cond = m * pre1 + math.ceil(2 * m / 4) * pre4 + max_tokens * _tok_at(vl, m)
    vis = _amortised(stage["vision_s"], stage["vision8_item_s"], m)
    enc = _amortised(stage["vae_encode_s"], stage["vae_encode8_item_s"], m)
    dec = _amortised(stage["vae_decode_s"], stage["vae_decode8_item_s"], m)
    return cond / m + vis + enc + dec


def simulate(sizes, batch: int, coef, vl, stage, steps: int = 40):
    """Run the arrival stream through both batching modes; returns the
    per-mode {item_s, edits_per_min, fill} plus the denoise-only mean."""
    # Per-item denoise at its native grid (identical in both modes: the
    # denoise runs per item / per shape group either way).
    denoise_each = [steps * step_at(coef, h // 16, w // 16)
                    for (w, h) in sizes]
    denoise_mean = float(np.mean(denoise_each))
    n = len(sizes)

    # mixed mode: arrival-order flushes of `batch` (last one partial)
    depths_mixed = [batch] * (n // batch) + ([n % batch] if n % batch else [])
    cond_mixed = sum(d * cond_per_item(d, vl, stage) for d in depths_mixed) / n

    # per-bucket mode: flush a /32 bucket when it reaches `batch`;
    # stragglers drain at their partial depth
    buckets: dict = {}
    depths_bucket = []
    for wh in sizes:
        buckets.setdefault(wh, 0)
        buckets[wh] += 1
        if buckets[wh] >= batch:
            depths_bucket.append(batch)
            buckets[wh] = 0
    depths_bucket += [c for c in buckets.values() if c]
    cond_bucket = sum(d * cond_per_item(d, vl, stage)
                      for d in depths_bucket) / n

    def row(cond_item, depths):
        item_s = denoise_mean + cond_item
        return {"item_s": item_s, "edits_per_min": 60.0 / item_s,
                "cond_item_s": cond_item,
                "mean_flush_depth": float(n / len(depths)),
                "fill": float(n / (len(depths) * batch))}

    return {"denoise_mean_s": denoise_mean,
            "n_buckets": len(set(sizes)),
            "mixed": row(cond_mixed, depths_mixed),
            "per_bucket": row(cond_bucket, depths_bucket)}


def measure_grids(cache, grids=MEASURE_GRIDS, reps=4):
    """Measure the 60-block W4A8 CFG step at each grid, sharing one
    quantized tree; each result persists to the stage cache immediately."""
    from tools.measure_dit60 import measure_dit60

    measured, params = {}, None
    for gh, gw in grids:
        name = f"dit60_step_g{gh}x{gw}"
        cached, lvl = cache.get(name)
        if cached is not None and lvl == 2:
            log(f"  {name}: cached {cached:.3f}s")
            measured[(gh, gw)] = cached
            continue
        t0 = time.perf_counter()
        s, params = measure_dit60(60, reps=reps, grid=(gh, gw),
                                  params=params)
        log(f"  grid ({gh},{gw}) S={joint_tokens(gh, gw)}: {s:.3f} s "
            f"({time.perf_counter()-t0:.0f}s incl compile)")
        cache.put(name, s)
        measured[(gh, gw)] = s
    return measured


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-measure", action="store_true",
                    help="reuse cached grid step times only (hermetic)")
    ap.add_argument("--out", default=None,
                    help="merge results into this detail artifact")
    ap.add_argument("--mix", default=None, help="JSON file with the "
                    "resolution mix (list of {weight, aspect, area})")
    ap.add_argument("--items", type=int, default=900)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default="/tmp/mixed_res.json")
    args = ap.parse_args(argv)

    import bench

    cache = bench.StageCache()
    if args.skip_measure:
        measured = {}
        for gh, gw in MEASURE_GRIDS:
            v, lvl = cache.get(f"dit60_step_g{gh}x{gw}")
            if v is not None and lvl >= 1:
                measured[(gh, gw)] = v
        if len(measured) < 3:
            raise SystemExit("--skip-measure: <3 cached grid stages; run "
                             "without it on the TPU first")
    else:
        measured = measure_grids(cache)

    coef, fit_rel = fit_step_model(measured)
    log(f"step model: {coef[0]*1e3:.2f} ms + {coef[1]*1e6:.3f} us*S + "
        f"{coef[2]*1e9:.4f} ns*S^2 (max rel resid {fit_rel:.3f})")

    # conditioning ladder + stage singles from the bench stage cache
    vl_c, lvl = cache.get("vl_1_2_8")
    vl_e, _ = cache.get("vl_4_16")
    vae_c, _ = cache.get("vae")
    vis_c, _ = cache.get("vision")
    if vl_c is None or vae_c is None or vis_c is None:
        raise SystemExit("bench stage cache lacks vl/vae/vision stages; "
                         "run `python bench.py` first")
    vl = {int(b): tuple(pt) for b, pt in vl_c.items()}
    if vl_e:
        vl.update({int(b): tuple(pt) for b, pt in vl_e.items()})
    enc_s, dec_s, dec8_s, enc8_s = vae_c
    stage = {"vision_s": vis_c[0], "vision8_item_s": vis_c[1],
             "vae_encode_s": enc_s, "vae_encode8_item_s": enc8_s / 8,
             "vae_decode_s": dec_s, "vae_decode8_item_s": dec8_s / 8}

    mix = DEFAULT_MIX
    if args.mix:
        with open(args.mix) as f:
            mix = json.load(f)
    sizes = sample_stream(mix, args.items, seed=args.seed)
    sim = simulate(sizes, args.batch, coef, vl, stage)

    result = {
        "grids_measured": {f"{gh}x{gw}": s
                           for (gh, gw), s in measured.items()},
        "step_model_coef": [float(c) for c in coef],
        "step_model_max_rel_resid": fit_rel,
        "mix": "default_approximation" if not args.mix else args.mix,
        "items": args.items, "batch": args.batch,
        **sim,
    }
    log(f"scenario: {args.items} items, {sim['n_buckets']} /32 buckets")
    log(f"  denoise mean: {sim['denoise_mean_s']:.1f}s/item")
    for mode in ("mixed", "per_bucket"):
        r = sim[mode]
        log(f"  {mode}: {r['item_s']:.2f}s/item -> "
            f"{r['edits_per_min']:.3f} edits/min/chip "
            f"(cond {r['cond_item_s']:.2f}s/item, fill {r['fill']:.2f}, "
            f"mean flush {r['mean_flush_depth']:.1f})")

    with open(args.json, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {args.json}")
    if args.out:
        bench._write_detail({"mixed_res": result}, args.out)
        log(f"merged into {args.out}")
    return result


if __name__ == "__main__":
    main()
