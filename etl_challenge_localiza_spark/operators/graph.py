"""Triangle counting over an undirected edge list — the third graph
shape beside connected components (operators/components.py) and
PageRank (operators/pagerank.py).

Degree-ordered (rank-based) enumeration, the standard distributed
algorithm (Cohen 2009 / Suri & Vassilvitskii "MapReduce triangles"):
orient every undirected edge from the lower-(degree, id) endpoint to
the higher one, build wedges by joining the oriented list with itself
on the middle vertex, then semi-check each wedge's closing edge
against the oriented list. Orientation makes the enumeration exact
(each triangle materializes exactly once, at its lowest-rank apex) and
bounds the join fan-out: every vertex's oriented out-degree is
O(sqrt(m)) regardless of raw degree, so the wedge count is O(m^{3/2})
— the skewed-hub blow-up of naive (u,v)x(v,w) wedge building cannot
happen. All three steps are hash-joins on vertex keys: the plan
shuffles the edge list three times and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """Vertex degrees of an undirected edge list with columns (u, v),
    one row per edge, no duplicates, u != v."""
    return (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def orient_by_rank(edges: DataFrame) -> DataFrame:
    """Direct each undirected edge (u, v) from the endpoint with the
    lower (degree, id) rank to the higher — returns columns (a, b)
    with rank(a) < rank(b). Two broadcast-eligible joins against the
    degree table (AQE broadcasts it while small; at 10^9+ edges both
    are plain shuffle hash joins on the vertex key)."""
    deg = degrees(edges)
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles of the undirected graph, one row per triangle,
    columns (a, b, c) where rank(a) < rank(b) < rank(c) in the
    degree-ordering. ``edges`` needs columns (u, v), one row per
    undirected edge (any consistent endpoint order), u != v."""
    o = orient_by_rank(edges)
    # wedges a->b->c rooted at the lowest-rank vertex a; out-degree of
    # every vertex in `o` is O(sqrt(m)), bounding the expansion.
    w = o.alias("e1").join(
        o.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
    )
    # a wedge is a triangle iff its closing edge (a, c) is oriented —
    # rank(a) < rank(c) holds by transitivity, so checking the oriented
    # list (a semi-join: no fan-out, no duplicate counting) is exact.
    closing = o.select(F.col("a"), F.col("b").alias("c"))
    return w.join(closing, ["a", "c"], "left_semi").select("a", "b", "c")
