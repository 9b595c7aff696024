"""Deduplication operators over the ``documents`` table
(SURVEY.md §2.9: exact, blocked n-gram Jaccard, MinHash-LSH, SimHash).

Generalizes the reference's keyed dedup (flows/pipeline.py:154-156,
see operators.cleaning.dedup_exact) to content-based near-duplicate
detection — the core pre-training-corpus pipeline operator.

Scale design:
- exact: hash-groupBy on md5(text); map-side partial aggregation means
  the shuffle carries one row per (hash, partition).
- n-gram Jaccard is BLOCKED on (lang, source): an unblocked shingle
  self-join is quadratic in docs-per-shingle, so real pipelines always
  block (or use LSH). Within-block join keys are (lang, source,
  shingle), which also co-partitions the pair aggregation.
- MinHash-LSH: signatures via ONE aggregate pass (k min-aggs over
  xxhash64(shingle, seed)), banded into buckets; candidate pairs only
  ever meet inside a (band, bucket) shuffle partition — the textbook
  sub-quadratic path. Verification joins shingle sets only for
  candidates.
- SimHash: 64 conditional sums in one aggregate pass, banded by 16-bit
  chunks for candidate generation, exact Hamming verify via xor+bit_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def doc_shingles(docs: DataFrame, n: int = 3, block_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id [, block cols], shingle) — distinct word n-grams."""
    cols = ["doc_id", *block_cols]
    return (
        docs.select(*cols, F.explode(shingles(tokens("text"), n)).alias("shingle"))
        .dropDuplicates([*cols, "shingle"])
    )


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact content dedup: group identical texts by md5, keep the
    lowest doc_id as canonical."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    block_cols: tuple[str, ...] = ("lang", "source"),
    max_df: int = 100,
) -> DataFrame:
    """Blocked n-gram Jaccard near-duplicate pairs.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) over distinct shingle sets,
    computed with exact integer counts (engine-portable doubles).
    Returns (doc_id_a, doc_id_b, jaccard) with a < b, jaccard ≥ threshold.

    Scale design (no self-join): a shingle shared by k docs in a block
    would emit k(k-1)/2 rows from a shingle self-join — quadratic in the
    hottest key. Instead:

    1. shingles are deduped PER ROW (``array_distinct`` before the
       explode), so the exploded stream is already the distinct
       (block, shingle, doc) relation — no distinct shuffle;
    2. that stream is aggregated ONCE on (block, shingle, doc_id); both
       the doc-frequency count and the capped set pass read this same
       exchange, so Spark's ReuseExchange materializes it a single time
       — text is tokenized/shingled ONCE (previously the df pass and
       the set pass each re-parsed every document);
    3. hot shingles (block doc-frequency > ``max_df``) are dropped via
       an anti join — the hot list is tiny by Zipf's law (AQE
       broadcasts it when it is), and a shingle shared by >max_df docs
       is boilerplate, not near-dup signal (standard df-capped jaccard,
       same cap mirrored in the oracle SQL);
    4. surviving entries are grouped into a per-(block, shingle) sorted
       doc-id set — bounded at ``max_df`` entries by step 3, so the
       collect is safe;
    5. pairs are generated JVM-side from each sorted set with a
       higher-order ``transform``/``flatten`` (≤ max_df²/2 per key by
       construction) and counted — one hash aggregate, no join.

    Both |A|, |B| and |A∩B| are computed over the CAPPED shingle
    universe so the jaccard stays a well-defined set similarity. Net:
    one parse of the corpus, one full shuffle of the distinct shingle
    stream (reused by both passes) + two small aggregations, no
    self-join, no cache.
    """
    cols = ["doc_id", *block_cols]
    raw = docs.select(
        *cols,
        F.explode(F.array_distinct(shingles(tokens("text"), n))).alias("shingle"),
    )
    key = [*block_cols, "shingle"]
    # one exchange at (key, doc_id) granularity; rows are already
    # distinct per doc, so this distinct() only pins a shuffle subtree
    # that BOTH downstream passes share verbatim (an agg with a helper
    # column would be pruned differently per branch and defeat
    # ReuseExchange)
    per_doc = raw.select(*key, "doc_id").distinct()
    df_counts = per_doc.groupBy(*key).agg(F.count(F.lit(1)).alias("df"))
    hot = df_counts.filter(F.col("df") > max_df).select(*key)
    # no broadcast hint: the hot list is tiny by Zipf's law at any scale
    # we've measured, but its size is data-dependent (grows with corpus
    # size), and a forced hint removes AQE's ability to fall back to a
    # shuffle join if a pathological corpus makes it large. AQE
    # broadcasts it anyway when it is actually small.
    ok = per_doc.join(hot, key, "left_anti")

    by_shingle = ok.groupBy(*key).agg(
        F.sort_array(F.collect_set("doc_id")).alias("docs")
    )
    sizes = ok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    pairs = by_shingle.filter(F.size("docs") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (a, i) -> "
                "transform(slice(docs, i + 2, size(docs) - i - 1), "
                "b -> struct(a, b))))"
            )
        ).alias("p")
    )
    inter = pairs.groupBy(
        F.col("p.a").alias("a_doc_id"), F.col("p.b").alias("b_doc_id")
    ).agg(F.count(F.lit(1)).alias("n_inter"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_doc_id").withColumnRenamed("n_shingles", "n_a"), "a_doc_id")
        .join(sizes.withColumnRenamed("doc_id", "b_doc_id").withColumnRenamed("n_shingles", "n_b"), "b_doc_id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a_doc_id").cast("long").alias("doc_id_a"),
            F.col("b_doc_id").cast("long").alias("doc_id_b"),
            "jaccard",
        )
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signatures in ONE aggregate pass: num_hashes min-aggs
    over seeded xxhash64 of each shingle (no per-hash shuffle)."""
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs (UNBLOCKED — the scale
    path when no natural blocking key exists).

    bands × rows = num_hashes; a pair becomes a candidate iff any band
    of its signatures matches exactly; candidates are verified with the
    exact shingle-set Jaccard. Deterministic (xxhash64 is seeded).
    Returns (doc_id_a, doc_id_b, jaccard).
    """
    rows = num_hashes // bands
    # signatures don't need distinct shingles (min over a multiset ==
    # min over its set), so they aggregate straight off the explode —
    # partial min-aggs run map-side and the distinct-shingle exchange
    # is skipped entirely on this path.
    sh_raw = docs.select(
        "doc_id", F.explode(shingles(tokens("text"), n)).alias("shingle")
    )
    sig = minhash_signatures(sh_raw, num_hashes)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.hash(*[F.col(f"mh_{bi * rows + r}") for r in range(rows)]).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # candidate pairs via ONE aggregation instead of a bucket self-join:
    # group each (band, bucket) into its sorted member set and expand
    # pairs JVM-side. A bucket with k members yields k(k-1)/2 pairs
    # either way (the self-join concentrates the same key in one task),
    # but the aggregate needs only one shuffle of the bucket stream and
    # its exchange is REUSED by the candidate-doc listing below. A
    # pathological mega-bucket means mass-identical docs — run exact
    # dedup first (dedup_corpus does).
    by_bucket = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    cand = (
        by_bucket.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (a, i) -> "
                    "transform(slice(docs, i + 2, size(docs) - i - 1), "
                    "b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a_doc_id"), F.col("p.b").alias("b_doc_id"))
        .dropDuplicates(["a_doc_id", "b_doc_id"])
    )

    # exact verify on candidates only: shrink the shingle sets to
    # candidate docs first (semi joins), THEN intersect — at scale the
    # candidate set is a tiny fraction of the corpus. No cache(): the
    # shared subtrees resolve to ReusedExchange, and cached blocks from
    # a lazy-returned frame would never be unpersisted (they accumulate
    # across repeated invocations).
    cand_docs = (
        by_bucket.select(F.explode("docs").alias("doc_id")).distinct()
    )
    # no broadcast hint: the candidate list is data-dependent (grows
    # with the corpus dup rate) — AQE broadcasts it while small and can
    # fall back to a shuffle join when it isn't (same policy as the
    # hot-shingle list above)
    sh_cand = sh_raw.join(
        cand_docs, "doc_id", "left_semi"
    ).dropDuplicates(["doc_id", "shingle"])
    sizes = sh_cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh_cand.select(F.col("doc_id").alias("a_doc_id"), F.col("shingle").alias("a_sh"))
    b = sh_cand.select(F.col("doc_id").alias("b_doc_id"), F.col("shingle").alias("b_sh"))
    ca = cand.join(a, "a_doc_id")
    inter = (
        ca.join(b, (ca["b_doc_id"] == b["b_doc_id"]) & (ca["a_sh"] == b["b_sh"]))
        .select(ca["a_doc_id"].alias("a_doc_id"), ca["b_doc_id"].alias("b_doc_id"))
        .groupBy("a_doc_id", "b_doc_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a_doc_id").withColumnRenamed("n_shingles", "n_a"), "a_doc_id")
        .join(sizes.withColumnRenamed("doc_id", "b_doc_id").withColumnRenamed("n_shingles", "n_b"), "b_doc_id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a_doc_id").cast("long").alias("doc_id_a"),
            F.col("b_doc_id").cast("long").alias("doc_id_b"),
            "jaccard",
        )
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document in one aggregate pass.

    For each bit b: sign of Σ_tokens (±1 by bit b of xxhash64(token)).
    The signature is assembled bit-by-bit into a long. All JVM-side.
    """
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    h = F.xxhash64("token")
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
            ).alias(f"s_{b}")
            for b in range(64)
        ]
    )
    sig = None
    for b in range(64):
        bit = F.when(F.col(f"s_{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: xor == or
    return bit_sums.select("doc_id", sig.alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates banded by 16-bit chunks (a pair
    within Hamming distance ≤ 3 of 64 bits must share at least one of 4
    chunks), verified with exact xor+bit_count Hamming distance.
    Returns (doc_id_a, doc_id_b, hamming)."""
    sig = simhash_signatures(docs)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val")
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("y.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
