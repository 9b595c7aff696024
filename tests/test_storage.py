"""Storage-layout scale techniques: bucketed co-located joins and
partition pruning. These are plan-level guarantees — the point is what
does NOT happen (no shuffle, no full scan), asserted on the executed
plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_challenge_localiza_spark.sources.readers import load_table


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, sf0001, no_broadcast):
    """Writing both join sides bucketed+sorted on the key lets the
    sort-merge join run with ZERO Exchange (the 100 TB co-location
    strategy for repeated fact⋈fact joins)."""
    orders = load_table(spark, sf0001, "orders")
    customer = load_table(spark, sf0001, "customer")
    import shutil

    spark.sql("drop table if exists b_orders")
    spark.sql("drop table if exists b_customer")
    # the default in-memory catalog forgets tables across sessions but
    # leaves their directories — clear them so saveAsTable can recreate
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .format("parquet").saveAsTable("b_orders")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .format("parquet").saveAsTable("b_customer")
    )
    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert joined.count() == orders.count()  # every order has a customer
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # the unbucketed equivalent DOES shuffle both sides
    plain = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    plain.count()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan


def test_partition_pruning(spark, sf0001, tmp_path):
    """A filter on the partition column must prune the scan to that
    partition's files only."""
    ev = load_table(spark, sf0001, "events")
    path = str(tmp_path / "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)

    read = spark.read.parquet(path).filter(F.col("event_type") == "click")
    n_click = read.count()
    assert n_click == ev.filter(F.col("event_type") == "click").count()
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "click" in plan, plan
    # pruned scan reads only the one partition directory
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*click[^\]]*\]", plan)
    assert m, plan


def test_analyze_table_stats_feed_cbo(spark, sf0001):
    """Catalog statistics surface: ANALYZE TABLE COMPUTE STATISTICS
    (table + column level) populates rowCount/sizeInBytes, the inputs
    Spark's cost-based optimizer and broadcast-threshold decisions read
    at planning time. On a cluster this is the post-load step for every
    staged table."""
    import shutil

    from etl_challenge_localiza_spark.sources.readers import load_table

    # a previous run's managed-table directory (untracked warehouse
    # litter) makes saveAsTable fail with LOCATION_ALREADY_EXISTS even
    # though the fresh session's catalog has no such table — drop both
    spark.sql("DROP TABLE IF EXISTS nation_stats_t")
    shutil.rmtree("spark-warehouse/nation_stats_t", ignore_errors=True)
    load_table(spark, sf0001, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats_t"
    )
    spark.sql("ANALYZE TABLE nation_stats_t COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE nation_stats_t COMPUTE STATISTICS FOR COLUMNS n_nationkey"
    )
    detail = spark.sql("DESCRIBE TABLE EXTENDED nation_stats_t").collect()
    stats = {r["col_name"]: r["data_type"] for r in detail}
    assert "Statistics" in stats and "25 rows" in stats["Statistics"]
    coldesc = spark.sql(
        "DESCRIBE EXTENDED nation_stats_t n_nationkey"
    ).collect()
    info = {r["info_name"]: r["info_value"] for r in coldesc}
    assert info.get("distinct_count") == "25"


def test_compact_parquet_small_files(spark, sf0001, tmp_path):
    """Compaction collapses a many-small-files layout into the target
    count without changing the data."""
    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.sources.sinks import compact_parquet

    p = str(tmp_path / "orders_small")
    orders = load_table(spark, sf0001, "orders")
    orders.repartition(16).write.parquet(p)
    import glob

    assert len(glob.glob(p + "/part-*.parquet")) == 16
    before = orders.count()
    n_files = compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert n_files == 1
    after = spark.read.parquet(p)
    assert after.count() == before
    assert sorted(after.columns) == sorted(orders.columns)
    # the crash-safe swap leaves no temp/backup residue on success
    assert not glob.glob(p + "._compact_*")


def test_compact_parquet_refuses_partitioned_layout(spark, sf0001, tmp_path):
    """A flat compaction of a Hive-partitioned layout would silently
    demote partition directories to data columns; the op must refuse."""
    import pytest

    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.sources.sinks import compact_parquet

    p = str(tmp_path / "orders_part")
    load_table(spark, sf0001, "orders").write.partitionBy("o_orderstatus").parquet(p)
    with pytest.raises(ValueError, match="partition"):
        compact_parquet(spark, p)
    # dataset untouched by the refusal
    assert spark.read.parquet(p).count() > 0


def test_merge_schema_read_evolved_partitions(spark, sf0001, tmp_path):
    """Schema evolution: later partitions add a column; a mergeSchema
    read unions the schemas and nulls the missing values — the
    append-only evolution path for long-lived 100 TB tables."""
    import pyspark.sql.functions as F

    from etl_challenge_localiza_spark.sources.readers import load_table

    base = str(tmp_path / "evolving")
    nation = load_table(spark, sf0001, "nation")
    nation.write.parquet(base + "/batch=1")
    nation.withColumn("ingest_tag", F.lit("v2")).write.parquet(base + "/batch=2")
    df = spark.read.option("mergeSchema", True).parquet(base)
    assert "ingest_tag" in df.columns
    assert df.count() == 50
    assert df.filter(F.col("ingest_tag").isNull()).count() == 25


def test_range_clustered_write_produces_skipping_friendly_files(spark, tmp_path):
    """write_range_clustered must yield parquet files whose per-file
    min/max footer ranges on the cluster column are (near-)disjoint —
    the property file-skipping engines prune on."""
    import pyarrow.parquet as pq

    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.sources.sinks import write_range_clustered

    path = str(tmp_path / "orders_by_price")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    write_range_clustered(orders, path, ["o_totalprice"], n_files=4)

    ranges = []
    import glob as _glob

    for f in sorted(_glob.glob(path + "/part-*.parquet")):
        md = pq.read_metadata(f)
        col_idx = md.schema.names.index("o_totalprice")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3  # range partitioner may merge tiny bounds

    # files must not overlap: sorted by min, each file's max <= next min
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {ranges}"

    # a selective read therefore touches one file's range only
    total = orders.count()
    one_file = spark.read.parquet(path).filter(
        f"o_totalprice <= {ranges[0][1]}"
    ).count()
    assert 0 < one_file < total


def test_bloom_filter_runtime_join_filter_fires(spark):
    """Runtime bloom-filter join pruning: with a selective filter on the
    dim side, Spark injects bloom_filter_might_contain on the fact scan
    — the shuffle-reduction mechanism for selective star joins at
    scale. Thresholds are lowered to fire on test-sized data."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        fact = spark.range(500_000).select(
            (F.col("id") % 1000).alias("key"), F.col("id").alias("payload")
        )
        dim = spark.range(1000).select(
            F.col("id").alias("key"), (F.col("id") % 7).alias("attr")
        )
        joined = fact.join(dim.filter(F.col("attr") == 3), "key")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_json_and_orc_round_trip(spark, tmp_path):
    """Source/sink format breadth beyond parquet+csv: JSON-lines and
    ORC writes must round-trip the orders table losslessly (dates
    re-cast on the JSON path — JSON has no date type)."""
    from etl_challenge_localiza_spark.sources.readers import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    baseline = sorted(map(tuple, orders.collect()))

    jpath = str(tmp_path / "orders_json")
    orders.write.mode("overwrite").json(jpath)
    back_j = spark.read.json(jpath)
    # JSON stringifies dates/decimals; re-apply the original schema
    back_j = back_j.select(
        *[back_j[f.name].cast(f.dataType).alias(f.name) for f in orders.schema.fields]
    )
    assert sorted(map(tuple, back_j.collect())) == baseline

    opath = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(opath)
    back_o = spark.read.orc(opath).select(*orders.columns)
    assert sorted(map(tuple, back_o.collect())) == baseline


def test_observe_metrics_ride_along_with_action(spark):
    """The observe() surface: pipeline-quality counters computed inside
    the SAME job as the action (no second pass over the data) — how the
    DQ counters of plans/pipeline.py would run at 100 TB."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    obs = Observation("dq")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null_v"),
    )
    assert observed.filter(F.col("v").isNotNull()).count() == 900
    assert obs.get == {"n_rows": 1000, "n_null_v": 100}


def test_snapshot_write_read_and_time_travel(spark, tmp_path):
    """Versioned snapshots: reads resolve the pointer (never a half-
    written directory), old versions stay readable, and a crashed
    writer (data written, pointer not swapped) leaves readers on the
    previous version."""
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.sources.sinks import (
        snapshot_current_version,
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "snap")
    v1 = snapshot_write(spark, spark.range(10).select(F.col("id")), path)
    v2 = snapshot_write(spark, spark.range(20).select(F.col("id")), path)
    assert (v1, v2) == (1, 2)
    assert snapshot_read(spark, path).count() == 20
    assert snapshot_read(spark, path, version=1).count() == 10  # time travel

    # simulate a writer crash AFTER data write, BEFORE pointer swap:
    spark.range(99).write.parquet(path + "/v=3")
    assert snapshot_current_version(path) == 2
    assert snapshot_read(spark, path).count() == 20  # readers unaffected

    # a recovering writer bumps PAST the orphaned v=3 directory (never
    # reuses untrusted leftovers) and publishes v=4
    v4 = snapshot_write(spark, spark.range(5).select(F.col("id")), path)
    assert v4 == 4
    assert snapshot_read(spark, path).count() == 5
    assert snapshot_read(spark, path, version=2).count() == 20


def test_orc_roundtrip_and_pushdown(spark, sf0001, tmp_path):
    """ORC sink/source: values survive the round-trip bit-for-bit and
    a filter on the ORC scan is pushed down (the format keeps the
    pruning/pushdown properties the parquet path relies on)."""
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.sources.sinks import write_orc

    src = load_table(spark, sf0001, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_orc_partitioned_write_prunes(spark, sf0001, tmp_path):
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.sources.sinks import write_orc

    src = load_table(spark, sf0001, "orders")
    path = str(tmp_path / "orders_orc_part")
    write_orc(src, path, partition_by=["o_orderstatus"])
    back = spark.read.orc(path)
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    n_f = back.filter(F.col("o_orderstatus") == "F").count()
    assert n_f == src.filter(F.col("o_orderstatus") == "F").count()


def test_jsonl_quarantine_split(spark, tmp_path):
    from etl_challenge_localiza_spark.sources.readers import read_jsonl_with_quarantine

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "score": 0.5}\n'
        '{"doc_id": 2, "text": "also ok", "score": 1.5}\n'
        '{"doc_id": 3, "text": "broken...\n'          # truncated JSON
        'not json at all\n'                            # garbage line
        '[1, 2, 3]\n'                                  # non-object top level
        '{"doc_id": 4, "score": 2.0}\n'                # missing field -> NULL, not corrupt
    )
    good, quar = read_jsonl_with_quarantine(
        spark, str(p), "doc_id long, text string, score double"
    )
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[4]["text"] is None  # missing field is a null, a DQ-gate concern
    bad = sorted(r["raw_line"] for r in quar.collect())
    assert len(bad) == 3
    assert any("not json at all" in line for line in bad)


def test_read_xml_warns_without_schema(spark, tmp_path):
    """Inferred-schema XML reads warn: ignoreSurroundingSpaces=false +
    inference can capture writer indentation as data (ADVICE r7)."""
    import warnings

    from etl_challenge_localiza_spark.sources.readers import read_xml
    from etl_challenge_localiza_spark.sources.sinks import write_xml

    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    p = str(tmp_path / "xml")
    write_xml(df, p, row_tag="rec")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        read_xml(spark, p, row_tag="rec")
    assert any("schema_ddl" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        read_xml(spark, p, row_tag="rec", schema_ddl="id bigint, text string")
    assert not any("schema_ddl" in str(x.message) for x in w)


def test_xml_roundtrip_escapes_special_chars(spark, tmp_path):
    from etl_challenge_localiza_spark.sources.readers import read_xml
    from etl_challenge_localiza_spark.sources.sinks import write_xml

    rows = [
        (1, 'needs <escaping> & "quotes" and \'apostrophes\''),
        (2, "unicode: héllo wörld — ☃ 中文"),
        (3, "a]]>cdata-terminator-lookalike"),
        (4, "  leading and trailing whitespace survive  "),
        (5, "\ttab-framed\t"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    p = str(tmp_path / "xml")
    write_xml(df, p, row_tag="rec")
    back = read_xml(spark, p, row_tag="rec", schema_ddl="id bigint, text string")
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_load_table_memo_hits_and_invalidates(spark, tmp_path):
    """The analyzed-plan memo returns the SAME DataFrame object for an
    unchanged table, and invalidates when a part file inside the table
    directory is rewritten in place — the case the top-level-dir mtime
    alone would miss (ADVICE r7: subdirectory/part-file rewrites don't
    bump the parent mtime)."""
    import os
    import shutil
    import time

    from etl_challenge_localiza_spark.sources.readers import load_table

    sf = str(tmp_path)
    tdir = os.path.join(sf, "t.parquet")
    spark.createDataFrame([(1, "a")], ["k", "s"]).coalesce(1).write.parquet(tdir)

    df1 = load_table(spark, sf, "t")
    df2 = load_table(spark, sf, "t")
    assert df1 is df2  # memo hit: same analyzed plan object

    # rewrite a part file IN PLACE (same name, same dir entry count) so
    # the parent directory's mtime/size stay put
    part = next(p for p in os.listdir(tdir) if p.endswith(".parquet"))
    stage = os.path.join(sf, "stage.parquet")
    spark.createDataFrame([(2, "b"), (3, "c")], ["k", "s"]).coalesce(1).write.parquet(stage)
    spart = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    shutil.copyfile(os.path.join(stage, spart), os.path.join(tdir, part))
    # keep Hadoop LocalFS's checksum sidecar consistent with the new bytes
    shutil.copyfile(
        os.path.join(stage, f".{spart}.crc"), os.path.join(tdir, f".{part}.crc")
    )

    df3 = load_table(spark, sf, "t")
    assert df3 is not df1  # entry-level stat folded into the key
    assert df3.count() == 2


def test_load_table_memo_invalidates_partition_subdir_rewrite(spark, tmp_path):
    """ADVICE r9: a same-named IN-PLACE rewrite of a part file inside a
    partition SUBDIRECTORY bumps neither the parent's nor the
    subdirectory's mtime/size — the cache key must fold one level of
    subdirectory files to catch it."""
    import os
    import shutil
    import time

    from etl_challenge_localiza_spark.sources.readers import load_table

    sf = str(tmp_path)
    tdir = os.path.join(sf, "t.parquet")
    spark.createDataFrame([(1, "a"), (2, "a")], ["k", "part"]).coalesce(
        1
    ).write.partitionBy("part").parquet(tdir)

    df1 = load_table(spark, sf, "t")
    assert load_table(spark, sf, "t") is df1  # memo hit

    sub = os.path.join(tdir, "part=a")
    part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
    stage = os.path.join(sf, "stage.parquet")
    spark.createDataFrame([(7,), (8,), (9,)], ["k"]).coalesce(1).write.parquet(stage)
    spart = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    time.sleep(0.01)
    # same-name in-place rewrite inside the subdirectory: parent AND
    # subdirectory mtimes unchanged (copyfile writes into the existing
    # dir entry), only the file's own mtime/size move
    shutil.copyfile(os.path.join(stage, spart), os.path.join(sub, part))
    shutil.copyfile(
        os.path.join(stage, f".{spart}.crc"), os.path.join(sub, f".{part}.crc")
    )

    df3 = load_table(spark, sf, "t")
    assert df3 is not df1  # subdir-file stat folded into the key
    assert df3.count() == 3


def test_orc_roundtrip_preserves_types_and_rows(spark, tmp_path):
    from etl_challenge_localiza_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.25, "2024-01-01 00:00:01"), (2, "b", -0.5, "2024-06-30 23:59:59")],
        "k long, s string, v double, ts string",
    ).selectExpr("k", "s", "v", "cast(ts as timestamp) as ts")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = spark.read.orc(path)
    assert back.schema == df.schema  # types preserved, no inference
    assert sorted(back.collect()) == sorted(df.collect())
