#!/usr/bin/env python3
"""Regenerate the streaming batch-parity artifact (STREAM_PARITY_r{N}.json).

The streaming tier's correctness contract (replay convergence, WAP sink
exactly-once, EMA/volume-bar/top-k batch parity, crash recovery) can't be
expressed through the DuckDB oracle gate, so it lives in ScalaTest
(graft.StreamingSpec). This script makes that tier auditable the same way
batch is: it re-runs the suite from scratch and writes one JSON verdict
per test, plus the commit and exit status, so a reviewer can diff the
artifact against HEAD and re-run the exact command themselves.

Usage: python3 tools/stream_parity.py <round-number>
Writes: STREAM_PARITY_r{N}.json in the repo root.
"""
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    proc = subprocess.run(
        ["sbt", "-batch", "testOnly graft.StreamingSpec"],
        cwd=ROOT, capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr

    # ScalaTest funsuite output: "[info] - <name>" on pass,
    # "[info] - <name> *** FAILED ***" on failure.
    tests = {}
    for line in out.splitlines():
        m = re.match(r"\[info\] - (.+?)( \*\*\* FAILED \*\*\*.*)?$", line)
        if m:
            tests[m.group(1)] = "fail" if m.group(2) else "pass"

    summary = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)", out)
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()

    artifact = {
        "round": rnd,
        "suite": "graft.StreamingSpec",
        "command": 'sbt -batch "testOnly graft.StreamingSpec"',
        "commit": commit,
        "succeeded": int(summary.group(1)) if summary else None,
        "failed": int(summary.group(2)) if summary else None,
        "all_pass": bool(summary) and summary.group(2) == "0" and proc.returncode == 0,
        "tests": tests,
    }
    path = ROOT / f"STREAM_PARITY_r{rnd}.json"
    path.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {path}: {len(tests)} tests, all_pass={artifact['all_pass']}")
    return 0 if artifact["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
