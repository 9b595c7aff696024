"""One-command release preflight: the exact verification chain every
round's close-out claim comes from, in the order the claims are made.

1. full pytest (unit/property/plan-guard/e2e suites);
2. full DuckDB-oracle harness at sf0.01 — the driver's correctness
   gate scale, every registry query;
3. determinism audit at sf0.1 — two same-session runs of every query,
   value-hash compared;
4. bench.py — the headline timing line.

Any step failing stops the chain (the later claims would be
meaningless). Total ~25 min on the 32-core box.

Usage: python -m tools.preflight [--skip-determinism]
"""

from __future__ import annotations

import subprocess
import sys
import time


def _run(label: str, cmd: list[str]) -> None:
    t0 = time.time()
    print(f"=== {label} ===", flush=True)
    proc = subprocess.run(cmd, cwd="/root/repo")
    dt = time.time() - t0
    if proc.returncode != 0:
        print(f"PREFLIGHT FAILED at {label} ({dt:.0f}s)", flush=True)
        sys.exit(proc.returncode)
    print(f"--- {label} ok ({dt:.0f}s)", flush=True)


def main() -> int:
    py = sys.executable
    _run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    _run(
        "oracle sf0.01",
        [py, "-m", "tests.oracle_harness", "--sf", "/root/testdata/sf0.01"],
    )
    if "--skip-determinism" not in sys.argv:
        _run(
            "determinism sf0.1",
            [py, "-m", "tools.determinism_audit", "--sf", "/root/testdata/sf0.1"],
        )
    _run("bench", [py, "bench.py"])
    print("PREFLIGHT GREEN", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
