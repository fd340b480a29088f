"""Render the measured-performance sections of BASELINE.md / PARITY.md
from the bench artifact — no hand-transcribed numbers anywhere.

bench.py writes BENCH_DETAIL.json (every stage measurement + composed
figures); this tool rewrites the text between the
`<!-- MEASURED:BEGIN -->` / `<!-- MEASURED:END -->` markers in both
documents from that artifact.  Run after every bench:

    python bench.py && python tools/render_measured.py
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- MEASURED:BEGIN -->", "<!-- MEASURED:END -->"


def _replace(path: str, body: str) -> None:
    with open(path) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"{path}: missing {BEGIN}/{END} markers")
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    text = pat.sub(BEGIN + "\n" + body.strip() + "\n" + END, text)
    with open(path, "w") as f:
        f.write(text)
    print(f"[render] updated {path}")


def baseline_body(d: dict) -> str:
    ms = lambda s: f"{s * 1e3:.1f} ms"  # noqa: E731
    vl = d["vl"]
    rows = [
        ("60-block CFG denoise step, W4A8 (blocks int4, embed/head bf16) "
         "+ slim last block, MEASURED",
         f"**{d['dit60_step_s']:.3f} s** "
         f"({d['dit60_step_s'] / d['blocks'] * 1e3:.2f} ms/block)"),
        (f"{d['steps']}-step denoise", f"{d['denoise_s']:.1f} s"),
    ]
    if "bf16_block_s" in d:   # budget-gated extra (bench.py main docstring)
        rows.append(("DiT block, bf16 (multi-chip parity mode, differenced)",
                     ms(d["bf16_block_s"])))
    rows += [
        ("Qwen2.5-VL-7B prefill S=1536 (Pallas GQA causal flash)",
         " / ".join(f"B={b}: {ms(v['prefill_s'])}"
                    for b, v in sorted(vl.items(), key=lambda kv: int(kv[0])))),
        ("Qwen2.5-VL-7B greedy decode (grouped GQA, no K/V repeat)",
         " / ".join(
             f"B={b}: {v['decode_s_per_tok_total'] * 1e3:.1f} ms/tok total"
             f" ({v['decode_s_per_tok_total'] / int(b) * 1e3:.2f}/item)"
             for b, v in sorted(vl.items(), key=lambda kv: int(kv[0])))),
        ("VAE encode 1024² / decode / decode B=8",
         f"{ms(d['vae_encode_s'])} / {ms(d['vae_decode_s'])} / "
         f"{ms(d['vae_decode_b8_s'])} "
         f"({ms(d['vae_decode_b8_s'] / 8)}/item)"),
        ("Vision tower 392² (one per edit, shared 3 ways)",
         ms(d["vision_s"])),
    ]
    if "dinov2_s" in d:       # budget-gated extra
        rows.append(("DINOv2-base 512² features (config #1)",
                     ms(d["dinov2_s"])))
    if "quant_delta" in d:
        qd = d["quant_delta"]
        rows.append(
            (f"W4A8-vs-bf16 DiT output delta, {qd['n_layers']} blocks, "
             "random weights (quality bound; real-weight LPIPS: "
             "docs/REAL_WEIGHTS.md)",
             f"rel L2 {qd['rel_l2']:.4f}, cosine {qd['cosine']:.5f}"))
    if "quant_divergence" in d:
        qv = d["quant_divergence"]
        n = len(qv["w4a8"]["rel_l2"])
        mixed = qv.get("mixed", {}).get("outer")
        sens = qv.get("sensitivity", {})
        rows.append(
            (f"Cumulative quantization divergence, {qv['blocks']}-block "
             f"full-depth denoise × {n} steps vs bf16 oracle "
             "(tools/quant_divergence.py)",
             f"all-int4 W4A8: rel L2 {qv['w4a8']['rel_l2'][-1]:.3f} "
             f"(cosine {qv['w4a8']['cosine'][-1]:.5f}); "
             + (f"**production mixed precision (blocks int4, embed/head "
                f"bf16): rel L2 {mixed['rel_l2'][-1]:.3f} "
                f"(cosine {mixed['cosine'][-1]:.5f})**" if mixed else "")))
        if sens:
            worst = max(sens.items(), key=lambda kv: kv[1]["rel_l2_final"])
            inner = {k: v for k, v in sens.items() if k != worst[0]}
            hi = max(v["rel_l2_final"] for v in inner.values()) if inner else 0
            rows.append(
                ("Per-layer-type int4 sensitivity (quantize ONE group, "
                 "rest bf16; final-step rel L2)",
                 f"{worst[0]} {worst[1]['rel_l2_final']:.4f} dominates; "
                 f"each per-block group ≤ {hi:.4f} "
                 "(qkv/attn_out/mod/fc1/fc2)"))
        ctd = qv.get("cfg_truncate", {})
        if ctd:
            kk = "30" if "30" in ctd else sorted(ctd, key=int)[-1]
            kt = ctd[kk]
            rows.append(
                (f"`--cfg_truncate_step {kk}` divergence (positive-only "
                 f"after step {kk}, same full-depth lane)",
                 f"adds rel L2 {kt['vs_w4a8']['rel_l2'][-1]:.4f} on top of "
                 "the quantized trajectory; vs the bf16 oracle "
                 f"{kt['vs_oracle_final_rel_l2']:.3f} (cosine "
                 f"{kt['vs_oracle_final_cosine']:.5f}) — identical to the "
                 "untruncated W4A8 figure, i.e. an order of magnitude "
                 "below the quantization noise floor"))
    rows += [
        ("Single-edit latency (validate path, ≤1000-token reasoner)",
         f"{d['edit_s']:.1f} s → {d['edits_per_min_single']:.3f} "
         f"edits/min/chip (typical 300-token reasoner: "
         f"{d['edits_per_min_single_typical']:.3f})"),
    ]
    train_path = os.path.join(REPO, "TRAIN_DETAIL.json")
    if os.path.exists(train_path):
        with open(train_path) as f:
            tr = json.load(f)
        for rank, row in sorted(tr.items(), key=lambda kv: int(kv[0])):
            dt = {"float32": "fp32", "bfloat16": "bf16"}.get(
                row["state_dtype"], row["state_dtype"])
            ldt = {"float32": "fp32", "bfloat16": "bf16"}.get(
                row["lora_dtype"], row["lora_dtype"])
            adt = {"float32": "", "bfloat16": ", bf16 adapters"}.get(
                row.get("adapters_dtype", "float32"), "")
            rows.append(
                (f"Train step, 1 chip, LoRA r={rank} + adapters "
                 f"(480×832, B=1, W4 frozen DiT, {row['optimizer']} "
                 f"{dt} states, {ldt} factors{adt})",
                 f"**{row['s_per_step']:.2f} s/step** "
                 f"(trainable {row['trainable_gb']:.2f} GB, "
                 f"opt state {row['opt_state_gb']:.2f} GB)"))
    for nb, item_s in sorted(d["serving_item_s"].items(),
                             key=lambda kv: int(kv[0])):
        rows.append((f"Sweep serving, {nb} items/batch (config #5, "
                     "workload-faithful full 40-step CFG)",
                     f"{item_s:.2f} s/item → {60 / item_s:.3f} edits/min/chip"))
    if "serving_edits_per_min_typical" in d:
        rows.append(("Sweep serving with a typical 300-token reasoner "
                     "(the ≤1000 budget is the conservative workload "
                     "definition; answers stop at EOS)",
                     f"{d['serving_edits_per_min_typical']:.3f} "
                     "edits/min/chip"))
    # guard: bench writes serving_item_s only for batches that fit HBM —
    # render the row only when at least one did, instead of crashing the
    # pre-snapshot integrity check with min() on an empty dict
    ct = d.get("cfg_truncate", {})
    if ct.get("serving_item_s"):
        best = min(ct["serving_item_s"].values())
        rows.append((f"Production serving, guidance interval k={ct['k']} "
                     "(`--cfg_truncate_step`: positive-only rows after "
                     f"step {ct['k']}; latent-divergence-qualified — see "
                     "the divergence rows above and the round-5 addendum)",
                     f"{best:.2f} s/item → {60 / best:.3f} edits/min/chip "
                     f"(1-row step {ct['dit60_step_b1_s'] * 1e3:.0f} ms)"))
    headline = (ct.get("serving_edits_per_min")
                or d["serving_edits_per_min"])
    hb = ct.get("serving_best_batch", d["serving_best_batch"])
    rows.append(("**HEADLINE: sweep-serving throughput "
                 f"(batch {hb}, guidance interval k={ct.get('k', 40)})**",
                 f"**{headline:.3f} edits/min/chip = "
                 f"{headline / 0.25:.2f}× the A100 analytic estimate "
                 f"(0.25)**  (workload-faithful full-CFG config: "
                 f"{d['serving_edits_per_min']:.3f} = "
                 f"{d['serving_edits_per_min'] / 0.25:.2f}×)"))
    out = ["*(generated by tools/render_measured.py from BENCH_DETAIL.json "
           "— do not edit by hand)*", "", "| Quantity | Value |", "|---|---|"]
    out += [f"| {k} | {v} |" for k, v in rows]
    return "\n".join(out)


def parity_body(d: dict) -> str:
    ct = d.get("cfg_truncate", {})
    headline = ct.get("serving_edits_per_min") or d["serving_edits_per_min"]
    return (
        "*(generated from BENCH_DETAIL.json)* — sweep-serving "
        f"**{headline:.3f} edits/min/chip = "
        f"{headline / 0.25:.2f}×** the A100 analytic "
        "estimate (0.25 incl. VLM; production guidance-interval config, "
        f"divergence-qualified — workload-faithful full-CFG: "
        f"{d['serving_edits_per_min']:.3f} = "
        f"{d['serving_edits_per_min'] / 0.25:.2f}×)"
        f"; single-edit latency {d['edit_s']:.1f} s "
        f"→ {d['edits_per_min_single']:.3f} edits/min/chip; 60-block W4A8 "
        f"denoise step MEASURED at {d['dit60_step_s']:.3f} s "
        f"({d['dit60_step_s'] / d['blocks'] * 1e3:.2f} ms/block, slim last "
        "block)."
    )


def main():
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        raise SystemExit("BENCH_DETAIL.json not found — run bench.py first")
    with open(detail_path) as f:
        d = json.load(f)
    _replace(os.path.join(REPO, "BASELINE.md"), baseline_body(d))
    _replace(os.path.join(REPO, "PARITY.md"), parity_body(d))


if __name__ == "__main__":
    sys.exit(main())
