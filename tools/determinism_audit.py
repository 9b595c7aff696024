"""Same-session determinism audit (VERDICT r5 directive #8).

Runs every registry query TWICE in one SparkSession at a given SF and
asserts the canonical value-hash (same canonicalization as the driver
mirror, tests/oracle_harness.canon_rows) is identical across the two
runs. This catches nondeterministic plans — untied window ranks (the
W1-tie class), unordered LIMIT without a full sort key, iteration-order
dependence in driver loops — BEFORE the external oracle does, since a
plan can be nondeterministic yet happen to match the oracle once.

Two executions of the same lazy plan in one session genuinely
re-execute (no result cache in Spark), and AQE + shuffle partitioning
may differ between runs, so per-partition orderings and float reduce
orders are re-rolled — exactly the noise sources we claim to have
engineered out (exact decimal/split-long sums, explicit tiebreakers).

Usage:
    python -m tools.determinism_audit [--sf DIR] [names...]

Exit 0 = every query stable; prints one PERF.md-ready summary line.
"""

from __future__ import annotations

import hashlib
import sys
import time


def value_hash(pdf) -> str:
    from tests.oracle_harness import canon_rows

    cols, rows = canon_rows(pdf)
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def audit(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    """Return {query_name: problem} for unstable/failing queries."""
    from etl_challenge_localiza_spark.registry import QUERIES

    problems: dict[str, str] = {}
    todo = [n for n in QUERIES if not names or n in names]
    for i, name in enumerate(todo):
        q = QUERIES[name]
        hashes = []
        try:
            for _ in range(2):
                hashes.append(value_hash(q.fn(spark, sf_dir).toPandas()))
        except Exception as e:  # noqa: BLE001
            problems[name] = f"execution failed: {type(e).__name__}: {e}"
            continue
        if hashes[0] != hashes[1]:
            problems[name] = f"UNSTABLE: run1={hashes[0][:12]} run2={hashes[1][:12]}"
            print(f"  [{i + 1}/{len(todo)}] {name}: {problems[name]}")
        else:
            print(f"  [{i + 1}/{len(todo)}] {name}: stable {hashes[0][:12]}")
    return problems


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        else:
            names.append(a)
    from etl_challenge_localiza_spark.session import get_spark

    spark = get_spark()
    t0 = time.time()
    problems = audit(spark, sf_dir, names or None)
    dt = time.time() - t0
    from etl_challenge_localiza_spark.registry import QUERIES

    n = len(names) if names else len(QUERIES)
    for name, p in problems.items():
        print(f"FAIL {name}: {p}")
    print(
        f"determinism audit: {n - len(problems)}/{n} stable across two "
        f"same-session runs at {sf_dir} ({dt:.0f}s)"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
