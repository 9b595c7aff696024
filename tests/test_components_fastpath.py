"""The connected-components small-graph fast path (optimization r14)
must be bit-identical to the distributed fixpoint loop on the same
edge list, and the budget must route correctly at its boundary."""

from __future__ import annotations

import etl_challenge_localiza_spark.operators.components as C


def _pseudorandom_edges(n_nodes=80, window=40, block=10):
    # sparse edges only within blocks of ``block`` nodes, so the graph
    # has several components (some blocks split further)
    pairs = []
    for i in range(n_nodes):
        for j in range(i + 1, n_nodes):
            if i // block != j // block:
                continue
            h = (i * 2654435761 + j * 40503 + 11) % 193
            if h < window:
                pairs.append((j, i) if h % 2 else (i, j))
    return pairs


def _run(spark, pairs, budget, monkeypatch):
    monkeypatch.setattr(C, "CC_LOCAL_EDGE_BUDGET", budget)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return sorted(
        (r.node, r.component) for r in C.connected_components(df).collect()
    )


def test_fast_path_matches_distributed_loop(spark, monkeypatch):
    pairs = _pseudorandom_edges()
    fast = _run(spark, pairs, budget=10**9, monkeypatch=monkeypatch)
    loop = _run(spark, pairs, budget=0, monkeypatch=monkeypatch)
    assert fast == loop
    # non-degenerate fixture: several multi-node components exist
    comps = {c for _n, c in fast}
    assert 1 < len(comps) < len(fast)


def test_budget_boundary_routes_exactly(spark, monkeypatch):
    pairs = [(1, 2), (2, 3), (10, 11)]
    # budget == edge count → fast path; budget == count-1 → loop.
    at = _run(spark, pairs, budget=len(pairs), monkeypatch=monkeypatch)
    below = _run(spark, pairs, budget=len(pairs) - 1, monkeypatch=monkeypatch)
    want = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]
    assert at == want
    assert below == want


def test_local_union_find_min_labels():
    # pure-python core: chain + singleton pair + orientation mix
    label = C._local_components([(5, 4), (4, 3), (9, 8), (3, 7)])
    assert label == {5: 3, 4: 3, 3: 3, 7: 3, 9: 8, 8: 8}
