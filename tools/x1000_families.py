"""Third-decade (×1000) growth rows for the remaining 100 TB headline
families (VERDICT r10 directive #4): `ivf_index_roundtrip` (claimed
corpus-size-independent probe reads — prove it one decade past ×100)
and `curation_funnel` (the full C4/Gopher+learned+DSIR curation pass
over 5M docs). The other two families the directive names run through
their dedicated tools at --factor 1000: `tools/semdedup_scaledk --op
pruned` (k ∝ N lane) and `tools/streaming_throughput`.

Method identical to the round-10 third-decade table (PERF.md): clone
tier from tools/sf1_bench.build_sf1 (semantics-preserving ×k), exec =
plan-built-then-noop-write, best-of-2, warm tier, 32 cores.

Usage: python -m tools.x1000_families [--factors 1,1000] [names...]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    factors = [1, 1000]
    names = ["ivf_index_roundtrip", "curation_funnel"]
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factors":
            factors = [int(x) for x in args.pop(0).split(",")]
        else:
            names = [a] + args
            break

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import get_spark
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="x1000_families")
    out = {}
    for kf in factors:
        if kf == 1:
            sf_dir = "/root/testdata/sf0.1"
        else:
            t0 = time.time()
            sf_dir = build_sf1(
                spark, kf, out_name="sf1" if kf == 10 else f"allx{kf}"
            )
            print(f"x{kf} tier ready ({time.time() - t0:.0f}s)", file=sys.stderr)
        for name in names:
            q = QUERIES[name]
            best = best_full = float("inf")
            try:
                for _ in range(2):
                    tf0 = time.perf_counter()
                    df = q.fn(spark, sf_dir)
                    te0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    te1 = time.perf_counter()
                    best = min(best, te1 - te0)
                    best_full = min(best_full, te1 - tf0)
            except Exception as e:  # e.g. a guard refusing at this scale
                print(f"  x{kf} {name}: REFUSED {e}", file=sys.stderr)
                continue
            out[(name, kf)] = (best, best_full)
            print(
                f"  x{kf} {name}: exec {best:.2f}s full {best_full:.2f}s",
                file=sys.stderr,
            )

    print("| query | " + " | ".join(f"×{kf}" for kf in factors) + " |")
    print("|---" * (1 + len(factors)) + "|")
    for name in names:
        cells = " | ".join(
            f"{out[(name, kf)][1]:.2f} s" for kf in factors if (name, kf) in out
        )
        print(f"| {name} | {cells} |")
    print(
        json.dumps(
            {
                "metric": "x1000_families",
                "rows": {
                    f"{n}@x{kf}": {"exec_s": round(e, 2), "full_s": round(f, 2)}
                    for (n, kf), (e, f) in out.items()
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
