"""One-command pre-snapshot ritual (docs/OPERATIONS.md "Pre-snapshot ritual").

Runs, in order, stopping at the first failure:

  1. artifact integrity  — tools/check_artifacts.py (BENCH_DETAIL.json
     parses + rendered tables regenerate byte-identically);
  2. fast test tier      — pytest -m "not slow" -q (every module, ~10 min);
  3. driver entry        — python __graft_entry__.py (single-chip compile);
  4. multichip dryrun    — dryrun_multichip(8) on the virtual CPU mesh
     (skipped with --no-dryrun; ~4 min of CPU compiles).

Usage:  python tools/preflight.py [--full] [--no-dryrun]
  --full       run the full suite instead of the fast tier (kernel/model
               changes warrant it; ~17 min warm on this host)
  --no-dryrun  skip step 4 (docs-only / artifact-only commits)

Exit code 0 = safe to snapshot.  Round 3 committed a 0-byte
BENCH_DETAIL.json because these steps were run piecemeal under time
pressure; this script is the single bell to ring instead.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label, cmd):
    t0 = time.monotonic()
    print(f"[preflight] {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    dt = time.monotonic() - t0
    if rc != 0:
        print(f"[preflight] FAIL ({label}, rc={rc}, {dt:.0f}s)", flush=True)
        sys.exit(rc)
    print(f"[preflight] ok ({label}, {dt:.0f}s)", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full test suite instead of the fast tier")
    ap.add_argument("--no-dryrun", action="store_true",
                    help="skip the 8-device virtual-mesh dryrun")
    a = ap.parse_args(argv)

    _run("artifacts", [sys.executable, "tools/check_artifacts.py"])
    tier = [] if a.full else ["-m", "not slow"]
    _run("tests", [sys.executable, "-m", "pytest", "tests/", "-q", *tier])
    _run("entry", [sys.executable, "__graft_entry__.py"])
    if a.full and not a.no_dryrun:
        # the full tier already subprocess-runs dryrun_multichip(8)
        # (tests/test_graft_entry.py slow lane) — don't pay the ~4-min
        # CPU-compile dryrun a second time
        print("[preflight] dryrun covered by the full tier — skipping",
              flush=True)
    elif not a.no_dryrun:
        _run("dryrun", [sys.executable, "-c",
                        "import __graft_entry__ as g; g.dryrun_multichip(8)"])
    print("[preflight] ALL GREEN — safe to snapshot", flush=True)


if __name__ == "__main__":
    main()
