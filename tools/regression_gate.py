"""Cumulative-green gate: every query that EVER passed the driver's
correctness window (any CORRECTNESS_r*.json) must still pass the local
oracle replica. Run before shipping a round:

    python tools/regression_gate.py [sf_dir]

Exit 0 = no regressions; exit 1 lists the queries that went red.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def ever_green() -> list[str]:
    names: list[str] = []
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
                and name not in names
            ):
                names.append(name)
    return names


def main() -> None:
    names = ever_green()
    if not names:
        print("no driver-green history found; nothing to gate")
        return
    print(f"gating {len(names)} ever-driver-green queries at {SF_DIR}")
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "check.py"), SF_DIR, *names],
        capture_output=True,
        text=True,
        check=False,
    )
    red = [
        line.split()[1].rstrip(":")
        for line in proc.stdout.splitlines()
        if line.startswith("FAIL")
    ]
    tail = [line for line in proc.stdout.splitlines() if " ok, " in line]
    print(tail[-1] if tail else proc.stdout[-200:])
    if red:
        print("REGRESSIONS (ever-green now red):", ", ".join(red))
        sys.exit(1)
    print("cumulative-green invariant holds")


if __name__ == "__main__":
    main()
