"""Capture .explain("formatted") for headline registry queries into
plans/r<N>/<query>_<tag>.txt (guide §1: record the plan shape before and
after every optimization so claims are checkable without running Spark).

Usage:
    python -m tools.capture_plans before            # all headliners
    python -m tools.capture_plans after q1 q2 ...   # a subset
Round dir via $SPARK_GRAFT_PLANS_ROUND (default r15).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    todo = names or [n for n, q in QUERIES.items() if q.headline]
    for name in todo:
        q = QUERIES[name]
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
