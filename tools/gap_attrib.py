"""Stage-level attribution of the Spark-vs-DuckDB gap at a clone tier
(VERDICT r8 directive #1).

For each named registry query, runs it once warm at the tier and then
reads the Spark EVENT LOG to split its wall clock into what the
executors actually did (sum of per-stage executorRunTime, input bytes,
shuffle bytes) versus what nobody did (stage-boundary scheduling,
driver planning, py4j) — the "fixed per-stage floor". The printed
verdict per query:

- ``floor``   — executor compute could not explain the wall even at
  perfect 32-way parallelism (utilization < 25%): the gap vs an
  embedded engine is Spark's per-stage constant, which amortizes with
  data, not a plan defect to fix.
- ``compute`` — executors were busy (utilization >= 25%): the wall is
  real work; if DuckDB is still faster the PLAN deserves a look
  (shuffle bytes, scan bytes, stage count are printed for that).

Usage: python -m tools.gap_attrib [--factor 30] name [name...]
Writes nothing; prints a markdown table for PERF.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

EVDIR = "/tmp/spark-events-gap-attrib"


def main() -> int:
    factor = 30
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factor":
            factor = int(args.pop(0))
        else:
            names.append(a)

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import RUNTIME_CONF, tune

    builder = (
        SparkSession.builder.appName("gap-attrib")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVDIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())
    cores = spark.sparkContext.defaultParallelism

    from tools.sf1_bench import build_sf1

    sf_dir = build_sf1(spark, factor, out_name="sf1" if factor == 10 else f"allx{factor}")
    QUERIES["top10_orders"].fn(spark, sf_dir).collect()  # warm-up

    # per-query wall windows, epoch ms to match event-log timestamps
    windows: list[tuple[str, float, float, float]] = []
    for name in names:
        q = QUERIES[name]
        df = q.fn(spark, sf_dir)  # build outside the window: exec only
        df.write.format("noop").mode("overwrite").save()  # warm run, not windowed
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        windows.append((name, t0 * 1000, t1 * 1000, t1 - t0))
        print(f"  {name}: exec {t1 - t0:.2f}s", file=sys.stderr)
    with open("/tmp/gap_attrib_windows.json", "w", encoding="utf-8") as fh:
        json.dump(windows, fh)
    spark.stop()

    # parse the event log: Spark 4 rolling logs are a DIRECTORY of
    # events_* part files; classic logs are a single file
    paths = glob.glob(os.path.join(EVDIR, "*"))
    assert len(paths) == 1, paths
    if os.path.isdir(paths[0]):
        files = sorted(glob.glob(os.path.join(paths[0], "events_*")))
    else:
        files = paths
    lines = []
    for p in files:
        with open(p, encoding="utf-8") as fh:
            lines.extend(fh)
    stages = []
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            acc = {
                a["Name"]: a.get("Value", 0)
                for a in si.get("Accumulables", [])
                if str(a.get("Name", "")).startswith("internal.metrics")
            }
            stages.append(
                {
                    "sub": si.get("Submission Time", 0),
                    "done": si.get("Completion Time", 0),
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                    "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                    "input_b": acc.get("internal.metrics.input.bytesRead", 0),
                    "sh_w_b": acc.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0
                    ),
                    "sh_r_b": acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0
                    )
                    + acc.get("internal.metrics.shuffle.read.localBytesRead", 0),
                }
            )

    print(
        "| query | wall | stages | tasks | exec-busy | util@"
        f"{cores} | input | shuffle r/w | verdict |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name, ms0, ms1, wall in windows:
        mine = [s for s in stages if ms0 <= s["sub"] <= ms1]
        busy = sum(s["run_ms"] for s in mine) / 1000.0
        util = busy / (cores * wall) if wall > 0 else 0.0
        inp = sum(s["input_b"] for s in mine) / 1e9
        shr = sum(s["sh_r_b"] for s in mine) / 1e9
        shw = sum(s["sh_w_b"] for s in mine) / 1e9
        ntasks = sum(s["tasks"] for s in mine)
        verdict = "floor" if util < 0.25 else "compute"
        print(
            f"| {name} | {wall:.2f} s | {len(mine)} | {ntasks} | {busy:.1f} s "
            f"| {util * 100:.0f}% | {inp:.2f} GB | {shr:.2f}/{shw:.2f} GB "
            f"| {verdict} |"
        )
        # top stages by executor time, for the compute-bound rows
        for s in sorted(mine, key=lambda s: -s["run_ms"])[:3]:
            if s["run_ms"] < 200:
                continue
            nm = s["name"].split("\n")[0][:60]
            print(
                f"|   ↳ {nm} | {(s['done'] - s['sub']) / 1000:.2f} s | | "
                f"{s['tasks']} | {s['run_ms'] / 1000:.1f} s | | | | |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
