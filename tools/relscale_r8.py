"""Growth-rate evidence for the round-6/7 operator families (VERDICT
r7 directive #1): the relscale table in PERF.md covers the relational
family; this tool produces the same ×10 (optionally ×30) wall-time
growth rows for the families whose 100 TB claims previously rested on
design argument alone — substring dedup, SemDeDup, k-means / trained
IVF, triangle counting, batched BPE, perceptual image dedup, and the
capped-vs-uncapped attribution pair.

Scaling tier: tools.sf1_bench.build_sf1 — EVERY table cloned ×k with
key offsets / token prefixes / component shifts chosen so join
selectivity, planted near-dup structure, and per-key history grow
realistically (see that module's docstring). ×1 is sf0.1 itself.

Timing: exec-only (noop write of the returned plan, best-of-2) AND
full-call (fn() + write — for the iterative operators the training
loop runs inside fn(), so full-call is the honest growth number; the
table reports both and flags which one each query's growth is judged
on).

Usage:  python -m tools.relscale_r8 [--scales 1,10] [names...]
Prints a markdown table for PERF.md plus one JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

# (name, judge_on) — judge_on is the column whose growth the claim is
# about: "full" for iterative/driver-loop operators, "exec" otherwise
TARGETS: list[tuple[str, str]] = [
    ("substring_dedup_spans", "exec"),
    ("semdedup_drop", "full"),  # k-means training inside fn()
    ("kmeans_fit_embeddings", "full"),
    ("ivf_search_trained_vec0", "full"),
    ("triangle_count_cosupply", "exec"),
    ("bpe_train_encode", "full"),  # merge sweeps inside fn()
    ("image_ahash_dedup", "exec"),
    ("attribution_multi_touch", "exec"),
    ("attribution_multi_touch_capped", "exec"),
    # round-9 ×100 decade check (VERDICT r8 directive #8)
    ("user_rolling_hour_stats", "exec"),
]

SRC = "/root/testdata/sf0.1"


def main() -> int:
    scales = [1, 10]
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--scales":
            scales = [int(s) for s in args.pop(0).split(",")]
        else:
            names.append(a)
    targets = [(n, j) for n, j in TARGETS if not names or n in names]
    # names not in the curated list run too, judged on exec (the default
    # for non-iterative operators) — lets new directives reuse the tool
    known = {n for n, _ in TARGETS}
    targets += [(n, "exec") for n in names if n not in known]

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import get_spark
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="relscale_r8")
    results: dict[int, dict[str, tuple[float, float]]] = {}
    for k in scales:
        if k == 1:
            sf_dir = SRC
        else:
            t0 = time.time()
            sf_dir = build_sf1(spark, k, out_name="sf1" if k == 10 else f"allx{k}")
            print(f"x{k} tier ready ({time.time() - t0:.0f}s)", file=sys.stderr)
        row: dict[str, tuple[float, float]] = {}
        for name, _judge in targets:
            best_e = best_f = float("inf")
            for _ in range(2):
                tf0 = time.perf_counter()
                df = QUERIES[name].fn(spark, sf_dir)
                te0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                te1 = time.perf_counter()
                best_e = min(best_e, te1 - te0)
                best_f = min(best_f, te1 - tf0)
            row[name] = (round(best_e, 3), round(best_f, 3))
            print(f"x{k} {name}: exec {best_e:.2f}s full {best_f:.2f}s", file=sys.stderr)
        results[k] = row

    base = scales[0]
    hdr_cells = " | ".join(
        f"x{k} exec | x{k} full" for k in scales
    )
    print(f"| query | {hdr_cells} | judged on | growth at x{scales[-1]} |")
    print("|---|" + "---|" * (2 * len(scales) + 2))
    summary = {}
    for name, judge in targets:
        cells = " | ".join(
            f"{results[k][name][0]:.2f} s | {results[k][name][1]:.2f} s" for k in scales
        )
        idx = 0 if judge == "exec" else 1
        g = results[scales[-1]][name][idx] / max(results[base][name][idx], 1e-9)
        summary[name] = round(g, 2)
        print(f"| {name} | {cells} | {judge} | x{g:.1f} |")
    print(json.dumps({"metric": "relscale_r8_growth", "scales": scales, "growth": summary}))
    # tear the JVM down explicitly: with the x10/x30 tiers cached the
    # gateway can keep the process alive for minutes after the table
    # prints (observed twice in round 8 — the run had to be killed)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
