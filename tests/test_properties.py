"""Property-based tests (SURVEY.md §5.2.5) — hypothesis generates the
dirty inputs, one Spark job per example (examples kept low: each is a
real distributed job).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_challenge_localiza_spark.operators.cleaning import clean_transactions
from etl_challenge_localiza_spark.operators.quality import dq_profile

pytestmark = pytest.mark.filterwarnings("ignore")

COLS = ["timestamp", "transaction_type", "amount", "receiving_address", "location_region", "risk_score"]

cell = st.one_of(
    st.none(),
    st.just(""),
    st.just("nan"),
    st.just("None"),
    st.just("0"),
    st.sampled_from(["sale", "SALE", " Sale ", "refund"]),
    st.integers(min_value=0, max_value=2**40).map(str),
    st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6).map(
        lambda f: f"{f:.4f}"
    ),
    st.text(alphabet="abcxyz ", min_size=0, max_size=8),
)

rows_strategy = st.lists(st.tuples(*[cell] * 6), min_size=0, max_size=25)

SLOW = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@given(rows=rows_strategy)
@SLOW
def test_conformity_rate_bounded(spark, rows):
    df = spark.createDataFrame(rows, schema=", ".join(f"{c} string" for c in COLS))
    m = dq_profile(df)
    assert 0.0 <= m["conformity_rate"] <= 1.0
    assert m["failed_rows_estimate"] >= 0


@given(rows=rows_strategy)
@SLOW
def test_clean_invariants(spark, rows):
    df = spark.createDataFrame(rows, schema=", ".join(f"{c} string" for c in COLS))
    out = clean_transactions(df).collect()
    for r in out:
        # survivors satisfy every rule the reference enforces
        assert r["timestamp"] is not None
        assert r["transaction_type"] is not None
        assert r["transaction_type"] == r["transaction_type"].strip().lower()
        assert r["amount"] is not None and r["amount"] >= 0
        assert r["location_region"] != "0"
    # dedup key uniqueness (D1)
    keys = [
        (r["timestamp"], r["receiving_address"], r["transaction_type"], r["amount"])
        for r in out
    ]
    assert len(keys) == len(set(keys))


epoch_units = st.sampled_from(
    [("s", 1), ("ms", 10**3), ("us", 10**6), ("ns", 10**9)]
)


@given(
    unit_mult=epoch_units,
    secs=st.lists(
        st.integers(min_value=10**9, max_value=2 * 10**9), min_size=1, max_size=10
    ),
)
@SLOW
def test_epoch_roundtrip_property(spark, unit_mult, secs):
    """Any batch of integer epochs in any unit parses to the exact
    instants (unit auto-detected from the batch median)."""
    import datetime as dt

    unit, mult = unit_mult
    from etl_challenge_localiza_spark.functions.timeparse import parse_timestamp_auto

    df = spark.createDataFrame([(str(s * mult),) for s in secs], ["timestamp"])
    out = [r["timestamp"] for r in parse_timestamp_auto(df, "timestamp").collect()]
    want = [
        dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None)
        for s in secs
    ]
    got = [t.replace(tzinfo=None) for t in out]
    assert sorted(got) == sorted(want), (unit, secs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),     # user_id
            st.integers(min_value=0, max_value=50),    # ts offset
        ),
        min_size=1,
        max_size=20,
    ),
    cut=st.integers(min_value=0, max_value=19),
)
def test_merge_latest_batch_slicing_invariance(spark, data, cut):
    """Property behind streaming_upsert_latest: for ANY slicing of the
    input into micro-batches, folding them through apply_latest_batch
    converges to the global latest-per-key table."""
    import datetime as dt

    from etl_challenge_localiza_spark.streaming.upsert import apply_latest_batch

    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, base + dt.timedelta(minutes=off), "e", float(i))
        for i, (u, off) in enumerate(data)
    ]

    def fold(batches):
        t = None
        for b in batches:
            if b:
                t = apply_latest_batch(t, spark.createDataFrame(b, cols))
        return sorted(t.collect())

    k = min(cut, len(rows) - 1) if len(rows) > 1 else 0
    one_shot = fold([rows])
    sliced = fold([rows[: k + 1], rows[k + 1 :]])
    reversed_slices = fold([rows[k + 1 :], rows[: k + 1]])
    assert one_shot == sliced == reversed_slices


words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(words, min_size=1, max_size=6))
def test_hashed_shingles_equal_string_shingles(spark, texts):
    """The pre-hashed long shingle path must preserve SET semantics:
    per-doc distinct-shingle counts and cross-doc intersection counts
    computed over hashes equal the ones computed over strings (the
    property the jaccard/minhash rewrite relies on; a collision or an
    off-by-one in the slice/zip construction breaks it)."""
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.functions.text import (
        shingle_hashes,
        shingles,
        tokens,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    both = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens("text"), 3)).alias("s"),
        F.array_distinct(shingle_hashes(tokens("text"), 3)).alias("h"),
    ).collect()
    str_sets = {r["doc_id"]: set(r["s"]) for r in both}
    hash_sets = {r["doc_id"]: set(r["h"]) for r in both}
    for did in str_sets:
        assert len(str_sets[did]) == len(hash_sets[did])
    for a in str_sets:
        for b in str_sets:
            if a < b:
                assert len(str_sets[a] & str_sets[b]) == len(
                    hash_sets[a] & hash_sets[b]
                )


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=15),
    rights=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=10),
)
@SLOW
def test_asof_nearest_matches_brute_force(spark, lefts, rights):
    """asof_nearest_join == per-row argmin |gap| with backward ties,
    for arbitrary time sets (duplicates included) on one key."""
    from etl_challenge_localiza_spark.operators.asof import asof_nearest_join

    rights = sorted(set(rights))
    left = spark.createDataFrame([(1, i, t) for i, t in enumerate(lefts)], ["k", "i", "t"])
    right = spark.createDataFrame([(1, t, f"v{t}") for t in rights], ["k", "rt", "v"])
    got = {
        r["i"]: (r["v"], r["direction"], r["gap"])
        for r in asof_nearest_join(left, right, "k", "k", "t", "rt", ["v"]).collect()
    }
    for i, t in enumerate(lefts):
        back = max((rt for rt in rights if rt <= t), default=None)
        fwd = min((rt for rt in rights if rt >= t), default=None)
        if back is not None and (fwd is None or t - back <= fwd - t):
            expect = (f"v{back}", "backward", t - back)
        else:
            expect = (f"v{fwd}", "forward", fwd - t)
        assert got[i] == expect, (i, t, got[i], expect)


@given(
    weights=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=20)
)
@SLOW
def test_nucleus_prefix_properties(spark, weights):
    """The kept set is always a PREFIX of the weight-desc order, keeps
    at least one row, and its mass never exceeds half the total except
    via the top-row guarantee."""
    from etl_challenge_localiza_spark.operators.curation import (
        nucleus_subset_by_group,
    )

    df = spark.createDataFrame(
        [("g", i, w) for i, w in enumerate(weights)], ["grp", "id", "w"]
    )
    rows = sorted(
        nucleus_subset_by_group(df, "grp", "w", "id").collect(),
        key=lambda r: r["rank_in_group"],
    )
    kept = [r["kept"] for r in rows]
    assert kept[0] is True
    # prefix property: no kept row after a dropped one
    assert all(not (kept[i] and not kept[i - 1]) for i in range(1, len(kept)))
    total = sum(weights)
    mass = sum(r["w"] for r in rows if r["kept"])
    n_kept = sum(kept)
    assert 2 * mass <= total or n_kept == 1
