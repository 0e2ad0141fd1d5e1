"""Repeat-run flake hunt over the driver's verification window.

The driver hash-checks the first ~50 entries of ``queries()`` once per
round; a query that is only *usually* right (float summation order, AQE
layout variance, partition-order dependence) shows up as an unreproducible
red row. This script re-runs the window N times through the strict parity
checker so nondeterminism has N chances to surface before the driver gets
one.

    python scripts/flake_hunt.py [N]        # default 3 repeats
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    window = list(E.queries().keys())[:50]
    here = os.path.dirname(os.path.abspath(__file__))
    failures = 0
    for i in range(repeats):
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "check_parity.py"), *window],
            capture_output=True,
            text=True,
        )
        tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        print(f"run {i + 1}/{repeats}: {tail}", flush=True)
        if proc.returncode != 0:
            failures += 1
            print(proc.stdout[-2000:])
    print(f"{repeats - failures}/{repeats} clean runs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
