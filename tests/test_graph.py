"""Triangle counting (operators/graph.py): exactness vs brute force,
hub-skew safety, and the degree-orientation invariants."""

from __future__ import annotations

from itertools import combinations

from etl_challenge_localiza_spark.operators.graph import orient_by_rank, triangles


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u long, v long"
    )


def _brute_triangles(pairs):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return {
        tuple(sorted(t))
        for t in combinations(sorted(adj), 3)
        if t[1] in adj[t[0]] and t[2] in adj[t[0]] and t[2] in adj[t[1]]
    }


def test_complete_graphs(spark):
    # K_n has C(n,3) triangles
    for n, want in [(4, 4), (5, 10)]:
        pairs = list(combinations(range(n), 2))
        assert triangles(_edges_df(spark, pairs)).count() == want


def test_star_plus_one_edge(spark):
    # hub with 50 leaves has no triangles; closing one leaf pair makes
    # exactly one — the skewed-hub case naive wedge-joins blow up on.
    pairs = [(100, i) for i in range(50)] + [(0, 1)]
    got = triangles(_edges_df(spark, pairs)).collect()
    assert len(got) == 1
    assert {got[0].a, got[0].b, got[0].c} == {100, 0, 1}


def test_pseudorandom_graph_matches_brute_force(spark):
    # deterministic pseudo-random graph: edge (i, j) present when a
    # fixed polynomial hash lands in a window; mixed endpoint order.
    pairs = []
    for i in range(40):
        for j in range(i + 1, 40):
            h = (i * 2654435761 + j * 40503 + 7) % 97
            if h < 20:
                pairs.append((j, i) if h % 2 else (i, j))
    got = {
        tuple(sorted((r.a, r.b, r.c)))
        for r in triangles(_edges_df(spark, pairs)).collect()
    }
    want = _brute_triangles(pairs)
    assert got == want
    assert len(got) > 10  # non-degenerate fixture


def test_orientation_is_acyclic_and_complete(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    o = orient_by_rank(_edges_df(spark, pairs)).collect()
    # every input edge appears exactly once, in exactly one direction
    assert len(o) == len(pairs)
    assert {tuple(sorted((r.a, r.b))) for r in o} == {
        tuple(sorted(p)) for p in pairs
    }
    # degree-rank ordering: a's (deg, id) < b's (deg, id)
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for r in o:
        assert (deg[r.a], r.a) < (deg[r.b], r.b)
