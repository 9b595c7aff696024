"""The staleness rotation driving queries() ordering (the driver's
correctness gate checks the FIRST 50 entries) — including the round-4
advisory fix: a query whose LATEST driver row failed must re-enter the
window immediately, not after the full rotation."""

from __future__ import annotations

import json


def _write(tmp_path, rnd, rows):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 5,
    "err": "no_oracle",
}


def test_staleness_map_green_and_rows_only(tmp_path):
    import __spark_entry__ as E

    _write(tmp_path, 1, {"a": GREEN, "b": ROWS_ONLY})
    _write(tmp_path, 2, {"a": GREEN, "c": GREEN})
    last = E._driver_last_checked(str(tmp_path))
    assert last == {"a": 2, "b": 1, "c": 2}  # rows-only counts as checked


def test_failed_latest_row_resets_to_never_checked(tmp_path):
    import __spark_entry__ as E

    red_hash = {**GREEN, "hash_match": False}
    red_err = {**GREEN, "err": "boom"}
    crashed_rows_only = {**ROWS_ONLY, "spark_rows": None}
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN, "c": GREEN, "d": ROWS_ONLY})
    _write(tmp_path, 2, {"b": red_hash, "c": red_err, "d": crashed_rows_only})
    last = E._driver_last_checked(str(tmp_path))
    # a: stays at its green round; b/c/d: latest row failed → round 0,
    # so they sort ahead of everything and re-enter the first-50 window
    assert last == {"a": 1, "b": 0, "c": 0, "d": 0}


def test_green_after_red_counts_as_checked(tmp_path):
    import __spark_entry__ as E

    _write(tmp_path, 1, {"a": {**GREEN, "hash_match": False}})
    _write(tmp_path, 2, {"a": GREEN})  # fixed and re-verified
    assert E._driver_last_checked(str(tmp_path)) == {"a": 2}


def test_r10_window_covers_new_and_r5_stale():
    """VERDICT r9 #2 done-criterion: the driver's 50-query window for
    round 10 must contain every never-checked addition AND all 17
    r5-stale names (new additions were capped well under 33 so both
    groups fit by construction)."""
    import __spark_entry__ as E

    window = list(E.queries())[:50]
    last = E._driver_last_checked()
    never = [n for n in E.queries() if n not in last]
    assert set(never) <= set(window), "a never-checked query fell outside the window"
    r5_stale = [n for n, rnd in last.items() if rnd == 5]
    assert set(r5_stale) <= set(window), (
        f"r5-stale names outside the 50-window: {sorted(set(r5_stale) - set(window))}"
    )
    assert len(never) + len(r5_stale) <= 50
