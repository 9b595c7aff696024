"""Unit tests for the MERGE/upsert operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_challenge_localiza_spark.operators.merge import merge_upsert


def test_merge_upsert_insert_update_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    out = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(target, updates, "id").collect()}
    assert out == {
        1: ("a", 10.0),   # untouched
        2: ("B", 22.0),   # updated
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_merge_upsert_with_deletes(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    updates = spark.createDataFrame(
        [(1, None, True), (3, "c", False)], ["id", "name", "is_delete"]
    )
    out = {r["id"]: r["name"] for r in merge_upsert(target, updates, "id", "is_delete").collect()}
    assert out == {2: "b", 3: "c"}


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "name"])
    updates = spark.createDataFrame([(1, "A")], ["id", "name"])
    once = merge_upsert(target, updates, "id")
    twice = merge_upsert(once, updates, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_snapshot_merge_versioned_roundtrip(spark, tmp_path):
    """snapshot_merge: each CDC batch commits a new atomic version;
    old versions stay time-travel readable; deletes cascade."""
    from etl_challenge_localiza_spark.operators.merge import snapshot_merge
    from etl_challenge_localiza_spark.sources.sinks import snapshot_read

    path = str(tmp_path / "tbl")
    v1 = snapshot_merge(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]),
        key="id",
    )
    assert v1 == 1
    v2 = snapshot_merge(
        spark,
        path,
        spark.createDataFrame(
            [(2, "B", False), (3, "c", False), (1, None, True)],
            ["id", "name", "is_delete"],
        ),
        key="id",
        delete_col="is_delete",
    )
    assert v2 == 2
    now = {r["id"]: r["name"] for r in snapshot_read(spark, path).collect()}
    assert now == {2: "B", 3: "c"}  # 1 deleted, 2 updated, 3 inserted
    then = {r["id"]: r["name"] for r in snapshot_read(spark, path, version=1).collect()}
    assert then == {1: "a", 2: "b"}  # time travel unchanged


def test_snapshot_merge_apply_latest_semantics(spark, tmp_path):
    """order_cols engages conditional merge: stale updates lose."""
    from etl_challenge_localiza_spark.operators.merge import snapshot_merge
    from etl_challenge_localiza_spark.sources.sinks import snapshot_read

    path = str(tmp_path / "tbl")
    snapshot_merge(
        spark,
        path,
        spark.createDataFrame([(1, 5, "fresh"), (2, 5, "old")], ["id", "ts", "val"]),
        key="id",
    )
    snapshot_merge(
        spark,
        path,
        spark.createDataFrame([(1, 3, "stale"), (2, 9, "new")], ["id", "ts", "val"]),
        key="id",
        order_cols=["ts"],
    )
    out = {r["id"]: (r["ts"], r["val"]) for r in snapshot_read(spark, path).collect()}
    assert out == {1: (5, "fresh"), 2: (9, "new")}  # stale lost, newer won


def test_snapshot_merge_concurrent_reader_sees_consistent_versions(spark, tmp_path):
    """The read-consistency claim, exercised: a reader thread hammering
    the table DURING a merge commit must only ever observe a complete
    version's row set (pre- or post-merge), never a mix, a partial
    file listing, or an error."""
    import threading

    from etl_challenge_localiza_spark.operators.merge import snapshot_merge
    from etl_challenge_localiza_spark.sources.sinks import snapshot_read

    path = str(tmp_path / "tbl")
    base = [(i, "v1") for i in range(200)]
    snapshot_merge(spark, path, spark.createDataFrame(base, ["id", "tag"]), key="id")
    expect_v1 = {(i, "v1") for i in range(200)}
    # updates rewrite half the keys and add 100 new ones
    upd = [(i, "v2") for i in range(100)] + [(i, "v2") for i in range(200, 300)]
    expect_v2 = (
        {(i, "v2") for i in range(100)}
        | {(i, "v1") for i in range(100, 200)}
        | {(i, "v2") for i in range(200, 300)}
    )

    seen: list[frozenset] = []
    errors: list[BaseException] = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                rows = frozenset(
                    (r["id"], r["tag"]) for r in snapshot_read(spark, path).collect()
                )
                seen.append(rows)
        except BaseException as e:  # noqa: BLE001 — re-raised via `errors`
            errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        snapshot_merge(
            spark, path, spark.createDataFrame(upd, ["id", "tag"]), key="id"
        )
        # a few post-commit reads so the thread observes v2 too —
        # bounded by wall clock so a dead reader thread fails the
        # assertions below instead of spinning forever
        import time as _time

        wait_until = _time.monotonic() + 30
        while (
            frozenset(expect_v2) not in seen
            and len(seen) < 500
            and t.is_alive()
            and _time.monotonic() < wait_until
        ):
            _time.sleep(0.05)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, errors
    assert seen, "reader never completed a read"
    bad = [s for s in seen if s not in (frozenset(expect_v1), frozenset(expect_v2))]
    assert not bad, f"reader observed {len(bad)} inconsistent states; first: {sorted(bad[0])[:5]}"


def test_merge_null_delete_flag_is_not_a_delete(spark):
    """NULL in a nullable is_delete column (Debezium-style CDC) must
    mean 'not a delete' — the row upserts normally instead of
    silently vanishing from both branches."""
    from etl_challenge_localiza_spark.operators.merge import snapshot_merge
    from etl_challenge_localiza_spark.sources.sinks import snapshot_read

    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    updates = spark.createDataFrame(
        [(1, "A", None), (2, None, True), (3, "c", None)],
        "id long, name string, is_delete boolean",
    )
    out = {
        r["id"]: r["name"]
        for r in merge_upsert(target, updates, "id", "is_delete").collect()
    }
    assert out == {1: "A", 3: "c"}  # NULL-flag rows upserted; 2 deleted

    # first-batch path of snapshot_merge: NULL-flag rows must survive
    import tempfile

    path = tempfile.mkdtemp() + "/t"
    snapshot_merge(spark, path, updates, key="id", delete_col="is_delete")
    assert {r["id"] for r in snapshot_read(spark, path).collect()} == {1, 3}


def test_snapshot_merge_detects_concurrent_writer(spark, tmp_path):
    """Single-writer enforcement: a LIVE writer (holding the flock)
    makes a second commit raise loudly; a crashed writer's leftover
    lock file is NOT a lock (the kernel released the flock with the
    dead process), so the next commit proceeds without any staleness
    heuristic."""
    import fcntl
    import os

    import pytest as _pytest

    from etl_challenge_localiza_spark.operators.merge import snapshot_merge
    from etl_challenge_localiza_spark.sources.sinks import (
        ConcurrentWriterError,
        snapshot_read,
    )

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    snapshot_merge(spark, path, df, key="id")
    lock = os.path.join(path, "_writer_lock")
    # the lock FILE persists at rest (unlink-on-release is the classic
    # flock race); what matters is that the flock itself was released
    assert os.path.exists(lock)

    # live writer: hold the flock on a separate fd (distinct open file
    # description — same contention as another process)
    fd = os.open(lock, os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        with _pytest.raises(ConcurrentWriterError, match="another writer"):
            snapshot_merge(spark, path, df, key="id")
    finally:
        os.close(fd)

    # crashed writer: fd closed (process death releases the flock) but
    # the file remains — the next commit must just proceed
    v = snapshot_merge(
        spark, path, spark.createDataFrame([(2, "b")], ["id", "name"]), key="id"
    )
    assert v == 2
    assert {r["id"] for r in snapshot_read(spark, path).collect()} == {1, 2}


def test_snapshot_vacuum_retention_and_pins(spark, tmp_path):
    """Vacuum removes only unpinned/expired versions: the current
    version and the keep_last window always survive, a pinned old
    version survives a vacuum that would expire it, and crashed-writer
    orphans above the pointer are pruned."""
    import os

    from etl_challenge_localiza_spark.sources.sinks import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    for i in range(1, 6):  # versions 1..5
        snapshot_write(
            spark, spark.createDataFrame([(i, f"v{i}")], ["id", "tag"]), path
        )
    # fake a crashed-writer orphan above the pointer + a leftover tmp
    os.makedirs(os.path.join(path, "v=9"))
    open(os.path.join(path, "_current.tmp.9"), "w").write("9")

    # a reader pinned to v2 is still scanning it
    removed = snapshot_vacuum(path, keep_last=2, pinned={2})
    assert removed == [1, 3, 9]  # v2 pinned, v4+v5 in window, orphan v9 gone
    assert not os.path.exists(os.path.join(path, "_current.tmp.9"))
    # the pinned reader's version is intact and readable
    assert snapshot_read(spark, path, version=2).count() == 1
    # current state untouched
    assert {r["id"] for r in snapshot_read(spark, path).collect()} == {5}
    # unpin and vacuum again: v2 and v3-already-gone; only v2 falls now
    assert snapshot_vacuum(path, keep_last=2) == [2]
    assert sorted(
        e for e in os.listdir(path) if e.startswith("v=")
    ) == ["v=4", "v=5"]


def test_snapshot_vacuum_blocked_by_live_writer(tmp_path):
    import os

    import pytest as _pytest

    from etl_challenge_localiza_spark.sources.sinks import (
        ConcurrentWriterError,
        snapshot_vacuum,
        snapshot_writer_lock,
    )

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    with snapshot_writer_lock(path):
        with _pytest.raises(ConcurrentWriterError):
            snapshot_vacuum(path, keep_last=1)


def test_crashed_writer_takeover_single_winner(tmp_path):
    """TOCTOU guard: many writers race at a crashed writer's leftover
    lock file; kernel flock arbitration admits exactly one winner —
    the rest get ConcurrentWriterError. (The old mtime-staleness
    protocol failed exactly this test: two breakers could unlink each
    other's fresh locks and both proceed.)"""
    import os
    import threading
    import time as _t

    from etl_challenge_localiza_spark.sources.sinks import (
        ConcurrentWriterError,
        snapshot_writer_lock,
    )

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    lock = os.path.join(path, "_writer_lock")
    open(lock, "w").write("pid=crashed\n")  # no flock held: crashed
    old = _t.time() - 7200
    os.utime(lock, (old, old))

    barrier = threading.Barrier(8)
    holders, denied = [], []
    hold = threading.Event()

    def contender(i):
        barrier.wait()
        try:
            with snapshot_writer_lock(path):
                holders.append(i)
                hold.wait(timeout=10)  # stay inside while others race
        except ConcurrentWriterError:
            denied.append(i)

    threads = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    # wait until every contender has either acquired or been denied
    deadline = _t.time() + 10
    while len(holders) + len(denied) < 8 and _t.time() < deadline:
        _t.sleep(0.01)
    hold.set()
    for t in threads:
        t.join(timeout=10)
    assert len(holders) == 1, f"expected one lock holder, got {holders}"
    assert len(denied) == 7
    # the flock is released: a fresh acquisition succeeds immediately
    with snapshot_writer_lock(path):
        pass


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    from etl_challenge_localiza_spark.operators.merge import snapshot_diff
    from etl_challenge_localiza_spark.sources.sinks import snapshot_write

    path = str(tmp_path / "tbl")
    v1 = snapshot_write(
        spark,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
        ),
        path,
    )
    v2 = snapshot_write(
        spark,
        spark.createDataFrame(
            # 1 unchanged, 2 value-changed, 3 deleted, 4 added
            [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0)],
            ["k", "s", "v"],
        ),
        path,
    )
    out = {r["k"]: r for r in snapshot_diff(spark, path, v1, v2, "k").collect()}
    assert {k: r["change"] for k, r in out.items()} == {
        2: "changed",
        3: "deleted",
        4: "added",
    }
    assert 1 not in out  # unchanged keys are dropped
    assert out[2]["old_fp"] is not None and out[2]["new_fp"] is not None
    assert out[3]["new_fp"] is None and out[4]["old_fp"] is None
    # reversing the versions flips added/deleted and keeps changed
    rev = {r["k"]: r["change"] for r in snapshot_diff(spark, path, v2, v1, "k").collect()}
    assert rev == {2: "changed", 3: "added", 4: "deleted"}


def test_snapshot_diff_canonical_fingerprint(spark, tmp_path):
    """Null patterns distinguish, NaN is self-stable (NaN==NaN for
    change detection), and map payload columns are refused — the
    canonical-encoding guarantees to_json could not give (ADVICE r6)."""
    import math

    import pytest as _pytest

    from etl_challenge_localiza_spark.operators.merge import snapshot_diff
    from etl_challenge_localiza_spark.sources.sinks import snapshot_write

    path = str(tmp_path / "tbl")
    nan = float("nan")
    v1 = snapshot_write(
        spark,
        spark.createDataFrame(
            [(1, None, "x"), (2, "u", None), (3, "w", None)],
            "k int, a string, b string",
        ).withColumn("v", F.lit(nan)),
        path,
    )
    v2 = snapshot_write(
        spark,
        spark.createDataFrame(
            # 1: null moved a->b (must be 'changed'); 2: unchanged incl
            # NaN payload (must NOT appear); 3: b null -> empty string
            # (must be 'changed' — null and '' are distinct)
            [(1, "x", None), (2, "u", None), (3, "w", "")],
            "k int, a string, b string",
        ).withColumn("v", F.lit(nan)),
        path,
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(spark, path, v1, v2, "k").collect()}
    assert out == {1: "changed", 3: "changed"}
    assert math.isnan(nan)  # sanity: the payload really was NaN

    mpath = str(tmp_path / "mtbl")
    mv = snapshot_write(
        spark,
        spark.range(1).select(
            F.col("id").alias("k"), F.create_map(F.lit("a"), F.lit(1)).alias("m")
        ),
        mpath,
    )
    with _pytest.raises(ValueError, match="map-typed"):
        snapshot_diff(spark, mpath, mv, mv, "k")


def test_snapshot_diff_injective_encoding(spark, tmp_path):
    """Adversarial separator/nesting cases (ADVICE r7): payload bytes
    must never shift a cell boundary, and maps are refused at ANY
    nesting depth — per-cell sha2 digests are fixed-width, so
    ('a\\x1fb','c') vs ('a','b\\x1fc') hash differently."""
    import pytest as _pytest

    from etl_challenge_localiza_spark.operators.merge import snapshot_diff
    from etl_challenge_localiza_spark.sources.sinks import snapshot_write

    path = str(tmp_path / "tbl")
    v1 = snapshot_write(
        spark,
        spark.createDataFrame(
            # k=1: separator byte inside a cell; k=2: value equal to the
            # retired null sentinel of the pre-r8 encoding
            [(1, "a\x1fb", "c"), (2, "\x00∅", "z")],
            "k int, a string, b string",
        ),
        path,
    )
    v2 = snapshot_write(
        spark,
        spark.createDataFrame(
            # k=1: same bytes, shifted cell boundary — MUST be 'changed';
            # k=2: old sentinel replaced by a real null — MUST be 'changed'
            [(1, "a", "b\x1fc"), (2, None, "z")],
            "k int, a string, b string",
        ),
        path,
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(spark, path, v1, v2, "k").collect()}
    assert out == {1: "changed", 2: "changed"}

    # arrays whose to_json differs even when cast-to-string collides:
    # ['a, b'] and ['a','b'] both cast to '[a, b]' but are distinct rows
    apath = str(tmp_path / "atbl")
    a1 = snapshot_write(
        spark,
        spark.createDataFrame([(1, ["a, b"])], "k int, arr array<string>"),
        apath,
    )
    a2 = snapshot_write(
        spark,
        spark.createDataFrame([(1, ["a", "b"])], "k int, arr array<string>"),
        apath,
    )
    aout = {r["k"]: r["change"] for r in snapshot_diff(spark, apath, a1, a2, "k").collect()}
    assert aout == {1: "changed"}

    # nested map (map inside a struct) refused, not silently hashed
    npath = str(tmp_path / "ntbl")
    nv = snapshot_write(
        spark,
        spark.range(1).select(
            F.col("id").alias("k"),
            F.struct(F.create_map(F.lit("a"), F.lit(1)).alias("m")).alias("s"),
        ),
        npath,
    )
    with _pytest.raises(ValueError, match="map-typed"):
        snapshot_diff(spark, npath, nv, nv, "k")


def test_snapshot_diff_refuses_schema_drift(spark, tmp_path):
    import pytest as _pytest

    from etl_challenge_localiza_spark.operators.merge import snapshot_diff
    from etl_challenge_localiza_spark.sources.sinks import snapshot_write

    path = str(tmp_path / "tbl")
    v1 = snapshot_write(spark, spark.createDataFrame([(1, "a")], ["k", "s"]), path)
    v2 = snapshot_write(
        spark, spark.createDataFrame([(1, "a", 9)], ["k", "s", "extra"]), path
    )
    with _pytest.raises(ValueError, match="schema drift"):
        snapshot_diff(spark, path, v1, v2, "k")


def test_incremental_agg_merge_equals_full_recompute(spark):
    from etl_challenge_localiza_spark.operators.merge import agg_state, merge_agg_states

    rows = [("a", 1.25), ("a", 2.50), ("b", 10.00), ("b", -3.75), ("c", 0.10)]
    delta_rows = [("a", 4.00), ("c", -1.10), ("d", 99.99)]  # d: new key
    hist = spark.createDataFrame(rows, ["k", "v"])
    delta = spark.createDataFrame(delta_rows, ["k", "v"])
    merged = {
        r["k"]: r
        for r in merge_agg_states(
            agg_state(hist, "k", "v"), agg_state(delta, "k", "v"), "k"
        ).collect()
    }
    full = {
        r["k"]: r
        for r in agg_state(hist.union(delta), "k", "v").collect()
    }
    assert set(merged) == set(full) == {"a", "b", "c", "d"}
    for k in full:
        assert merged[k]["n"] == full[k]["n"]
        assert merged[k]["total_dec"] == full[k]["total_dec"]
        assert merged[k]["vmin"] == full[k]["vmin"]
        assert merged[k]["vmax"] == full[k]["vmax"]
    # state-only key survives a merge with an empty delta
    empty = spark.createDataFrame([], hist.schema)
    alone = merge_agg_states(
        agg_state(hist, "k", "v"), agg_state(empty, "k", "v"), "k"
    )
    assert {r["k"]: r["n"] for r in alone.collect()} == {"a": 2, "b": 2, "c": 1}


def test_diff_frames_classifies_added_deleted_changed(spark):
    from etl_challenge_localiza_spark.operators.merge import diff_frames

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "CHANGED", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    out = {r["k"]: r["change"] for r in diff_frames(old, new, "k").collect()}
    # k=2 unchanged → absent; 1 deleted, 3 changed, 4 added
    assert out == {1: "deleted", 3: "changed", 4: "added"}


def test_diff_frames_schema_drift_raises(spark):
    import pytest as _pytest

    from etl_challenge_localiza_spark.operators.merge import diff_frames

    old = spark.createDataFrame([(1, "a")], "k int, s string")
    new = spark.createDataFrame([(1, "a", 2.0)], "k int, s string, extra double")
    with _pytest.raises(ValueError, match="schema drift"):
        diff_frames(old, new, "k")
