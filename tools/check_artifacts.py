"""Pre-snapshot artifact-integrity check (run alongside the test suite).

Round 3 committed a 0-byte BENCH_DETAIL.json (a test stub truncated the
real artifact) and the measured tables in BASELINE.md / PARITY.md became
unregenerable.  This guard fails fast if any committed measurement artifact
is empty, unparsable, or cannot regenerate the rendered tables:

    python tools/check_artifacts.py        # exits non-zero on any problem

Checks:
  1. BENCH_DETAIL.json exists, is non-empty, parses, and carries the
     headline keys bench.py always writes on the critical path.
  2. tools/render_measured.py's body builders succeed against it (without
     rewriting the .md files).
  3. BASELINE.md and PARITY.md contain the MEASURED markers and their
     rendered bodies are in sync with the artifact (regeneration would be
     a no-op) — catches hand-edits and stale tables.
  4. TRAIN_DETAIL.json (if present) parses and has the row schema
     render_measured consumes.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REQUIRED_DETAIL_KEYS = (
    "dit60_step_s", "denoise_s", "vl", "vae_encode_s", "vae_decode_s",
    "vision_s", "edit_s", "edits_per_min_single", "serving_item_s",
    "serving_best_batch", "serving_edits_per_min",
)


def fail(msg: str) -> "None":
    print(f"[check_artifacts] FAIL: {msg}", file=sys.stderr)
    raise SystemExit(1)


def main() -> None:
    from tools import render_measured as rm

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        fail("BENCH_DETAIL.json missing")
    if os.path.getsize(detail_path) == 0:
        fail("BENCH_DETAIL.json is EMPTY (the round-3 failure mode)")
    with open(detail_path) as f:
        try:
            d = json.load(f)
        except json.JSONDecodeError as e:
            fail(f"BENCH_DETAIL.json unparsable: {e}")
    missing = [k for k in REQUIRED_DETAIL_KEYS if k not in d]
    if missing:
        fail(f"BENCH_DETAIL.json missing keys: {missing}")

    # validate TRAIN_DETAIL's schema BEFORE baseline_body consumes it so a
    # malformed row gets the clean FAIL line, not a raw KeyError traceback
    train_path = os.path.join(REPO, "TRAIN_DETAIL.json")
    if os.path.exists(train_path):
        with open(train_path) as f:
            try:
                tr = json.load(f)
            except json.JSONDecodeError as e:
                fail(f"TRAIN_DETAIL.json unparsable: {e}")
        if not isinstance(tr, dict):
            fail(f"TRAIN_DETAIL.json: expected rank->row dict, "
                 f"got {type(tr).__name__}")
        for rank, row in tr.items():
            if not isinstance(row, dict):
                fail(f"TRAIN_DETAIL.json rank {rank}: expected row dict, "
                     f"got {type(row).__name__}")
            for key in ("s_per_step", "optimizer", "state_dtype",
                        "lora_dtype", "trainable_gb", "opt_state_gb"):
                if key not in row:
                    fail(f"TRAIN_DETAIL.json rank {rank}: missing {key}")

    baseline_body = rm.baseline_body(d)
    parity_body = rm.parity_body(d)
    if "HEADLINE" not in baseline_body:
        fail("rendered BASELINE body lost the HEADLINE row")

    for path, body in ((os.path.join(REPO, "BASELINE.md"), baseline_body),
                       (os.path.join(REPO, "PARITY.md"), parity_body)):
        with open(path) as f:
            text = f.read()
        if rm.BEGIN not in text or rm.END not in text:
            fail(f"{os.path.basename(path)}: missing MEASURED markers")
        current = re.search(
            re.escape(rm.BEGIN) + r"\n(.*?)\n" + re.escape(rm.END),
            text, re.S)
        if current is None or current.group(1).strip() != body.strip():
            fail(f"{os.path.basename(path)}: MEASURED block out of sync "
                 "with BENCH_DETAIL.json — run tools/render_measured.py")

    print("[check_artifacts] OK: BENCH_DETAIL.json + rendered tables in sync")


if __name__ == "__main__":
    main()
