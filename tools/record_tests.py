"""Run the test suite and persist a per-round evidence record.

VERDICT r3 weak #7: the strongest evidence in the repo (torch parity, CDF
table matches, cross-codec interop) is slow-gated and nothing recorded it
running. This tool runs the fast and slow suites and writes TESTS_r{N}.json
at the repo root with pass/fail counts and the summary tails, so each
round carries a committed record of the full gate.

Run: python tools/record_tests.py --round 4 [--fast-only|--slow-only]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_suite(marker_args, timeout=7200):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *marker_args],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    summary = {}
    for key in ("passed", "failed", "error", "skipped", "deselected"):
        m = re.search(rf"(\d+) {key}", proc.stdout)
        summary[key] = int(m.group(1)) if m else 0
    summary["rc"] = proc.returncode
    summary["wall_s"] = round(time.time() - t0, 1)
    summary["tail"] = tail
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--fast-only", action="store_true")
    ap.add_argument("--slow-only", action="store_true")
    args = ap.parse_args()

    out_path = REPO / f"TESTS_r{args.round:02d}.json"
    record = {}
    if out_path.exists():
        try:
            record = json.loads(out_path.read_text())
        except ValueError:
            record = {}

    if not args.slow_only:
        print("running fast suite...", flush=True)
        record["fast"] = run_suite(["-m", "not slow"])
        print(json.dumps(record["fast"], indent=2), flush=True)
    if not args.fast_only:
        print("running slow suite...", flush=True)
        record["slow"] = run_suite(["-m", "slow"])
        print(json.dumps(record["slow"], indent=2), flush=True)

    record["ok"] = all(
        v.get("rc") == 0 for k, v in record.items() if k in ("fast", "slow")
    )
    out_path.write_text(json.dumps(record, indent=2))
    print(f"wrote {out_path} ok={record['ok']}")
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()
