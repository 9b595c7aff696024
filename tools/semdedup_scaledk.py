"""SemDeDup growth measurement under the operator's OWN scale contract
(k ∝ N — Abbas et al. use k ≈ N/100, and semdedup_drop's docstring
states cluster size must stay bounded). The registry query pins k=8
for oracle determinism; scaling DATA ×30 while HOLDING k=8 grows each
cluster ×30 and the within-cluster pair count ×900 — the quadratic
regime the contract exists to forbid (measured: the ×30 fixed-k run
was killed after 15+ min in a single coalesced-partition cosine
stage). This tool measures the honest pairing: ×K data with ×K
clusters, so expected cluster size — and the per-vector pair work —
stays constant.

Usage: python -m tools.semdedup_scaledk [--factors 1,10,30] [--op semdedup|kmeans|pruned] [--cap N]

``--cap N`` (pruned only) sets max_cluster_size=N — the r12 pair-work
budget: oversized fine clusters are split by one extra sample-Lloyd
sweep so the within-cluster pair stage is bounded by the cap instead
of the worst cluster (VERDICT r11 #5; the x1000 uncapped run measured
37 min with the pair stage dominant).

``--op pruned`` times ``semdedup_drop_pruned`` (the IVF-pruned k ∝ N
lane) — used for the ×100 decade check (VERDICT r8 directive #8).

``--op kmeans`` times the BARE ``kmeans_fit`` in the same k ∝ N regime
(VERDICT r8 directive #3: the fit's fixed-k growth row measured ×0.8 at
×10 — fixed-cost-dominated — so its data-bound behavior needed its own
measurement). Note the expected asymptote differs from SemDeDup's: the
Lloyd assignment step is N·k distance evaluations with a broadcast
codebook, so at k ∝ N the per-sweep WORK is O(N²/c) by definition —
the measurement tells us where the crossover from fixed-cost to
compute-bound sits and whether the wall tracks the work (parallel) or
exceeds it (a serialization to fix). Production k-means at huge N·k
uses assignment pruning (triangle-inequality / IVF-style shortlists) —
the same pruning `semdedup_drop_pruned` applies to its scoring pass.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    factors = [1, 10, 30]
    op = "semdedup"
    if "--factors" in sys.argv:
        factors = [int(x) for x in sys.argv[sys.argv.index("--factors") + 1].split(",")]
    if "--op" in sys.argv:
        op = sys.argv[sys.argv.index("--op") + 1]
    cap = None
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])

    from etl_challenge_localiza_spark.operators.kmeans import kmeans_fit
    from etl_challenge_localiza_spark.operators.similarity import (
        semdedup_drop,
        semdedup_drop_pruned,
    )
    from etl_challenge_localiza_spark.session import get_spark
    from etl_challenge_localiza_spark.sources.readers import load_table
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="semdedup_scaledk")
    print(f"op={op}")
    print("| factor | k | wall (full, best-of-2) | per-×1 ratio |")
    print("|---|---|---|---|")
    base = None
    for kf in factors:
        if kf == 1:
            sf_dir = "/root/testdata/sf0.1"
        else:
            sf_dir = build_sf1(spark, kf, out_name="sf1" if kf == 10 else f"allx{kf}")
        emb = load_table(spark, sf_dir, "embeddings")
        k = 8 * kf
        iters = 1 if kf >= 1000 else 2  # x1000 runs ~30 min; one honest pass
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            if op == "kmeans":
                cents, sweeps = kmeans_fit(emb, k=k, max_sweeps=3)
                assert len(cents) == k and sweeps >= 1
            elif op == "pruned":
                semdedup_drop_pruned(
                    emb, k=k, max_sweeps=3, max_cluster_size=cap
                ).write.format("noop").mode("overwrite").save()
            else:
                semdedup_drop(emb, k=k, max_sweeps=3).write.format("noop").mode(
                    "overwrite"
                ).save()
            best = min(best, time.perf_counter() - t0)
        if base is None:
            base = best
        print(f"| x{kf} | {k} | {best:.2f} s | x{best / base:.1f} |")
        print(f"x{kf} k={k}: {best:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
