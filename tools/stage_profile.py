"""Per-stage time attribution for registry queries (guide §1.1/§7.1:
find where the time goes before changing anything).

Runs each named query through the noop sink on a UI-enabled session and
dumps per-stage metrics from the local REST API: stage wall, executor
run time, shuffle read/write bytes, task count, and the stage's first
line of detail (to map back to operators).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python -m tools.stage_profile minhash_near_dup txn_clean ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import DEFAULT_CPUS, RUNTIME_CONF

    builder = (
        SparkSession.builder.appName("stage_profile")
        .master(f"local[{DEFAULT_CPUS}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # warm-up
    QUERIES["top10_orders"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.load(r)

    for name in names:
        q = QUERIES[name]
        df = q.fn(spark, sf_dir)
        before_ids = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in before_ids]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages ===")
        for s in new:
            sub = s.get("submissionTime"); comp = s.get("completionTime")
            print(
                f"  stage {s['stageId']:>4} {s['status']:<9} tasks={s['numCompleteTasks']:>3} "
                f"run={s.get('executorRunTime', 0)/1e3:7.3f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.3f}s "
                f"shR={s.get('shuffleReadBytes', 0)>>10:>7}K shW={s.get('shuffleWriteBytes', 0)>>10:>7}K "
                f"in={s.get('inputBytes', 0)>>10:>7}K  {s.get('name','')[:60]}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
