"""Connected-components operator (operators/graph.py): correctness on
shapes that stress the iteration — long chains (pointer-jump speedup),
multiple components, singletons, duplicate/reversed edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_development_spark.operators.graph import (
    connected_components,
)


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "id: bigint")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "id1: bigint, id2: bigint"
    )
    if not edges:
        edf = edf.filter(F.col("id1").isNotNull())
    out = connected_components(ndf, edf, "id", "id1", "id2")
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 40-node chain: the worst case for plain propagation (40 rounds);
    # pointer jumping must converge well inside max_iter=50 AND label
    # every node with the chain head.
    n = 40
    got = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_components_singletons_and_duplicate_edges(spark):
    nodes = range(10)
    edges = [
        (1, 2), (2, 1), (2, 3),          # component {1,2,3} w/ reversed dup
        (5, 6), (6, 7), (5, 7),          # component {5,6,7} w/ triangle
        (8, 9), (8, 9),                  # component {8,9} w/ exact dup
    ]
    got = _cc(spark, nodes, edges)
    assert got == {
        0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9 - 1,
    }


def test_no_edges_all_singletons(spark):
    got = _cc(spark, range(5), [])
    assert got == {i: i for i in range(5)}


def _pr_reference(edges, iterations=3, scale=1_000_000):
    """Independent pure-Python replay of the integer PageRank recurrence."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    nodes = sorted({n for e in edges for n in e})
    rank = {n: scale for n in nodes}
    teleport = scale * 15 // 100
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, dsts in out.items():
            c = (85 * rank[s]) // (100 * len(dsts))
            for d in dsts:
                inflow[d] += c
        rank = {n: teleport + inflow[n] for n in nodes}
    return rank


def _pr(spark, edges, **kw):
    from data_engineer_development_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_reference_recurrence(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (2, 4),
    ]
    assert _pr(spark, edges) == _pr_reference(edges)


def test_pagerank_broadcast_and_shuffle_modes_agree(spark):
    edges = [(i, (i * 3) % 7 + 1) for i in range(1, 8)] + [(7, 1), (2, 5)]
    a = _pr(spark, edges, broadcast_ranks=False)
    b = _pr(spark, edges, broadcast_ranks=True)
    assert a == b == _pr_reference(edges)


def test_pagerank_dangling_node_keeps_teleport_only(spark):
    # node 3 has no outgoing edges (dangling): it receives but never sends;
    # node 2's rank after round 1 is teleport only once 1 stops feeding it
    edges = [(1, 2), (2, 3)]
    got = _pr(spark, edges)
    assert got == _pr_reference(edges)
    assert got[1] == 150_000  # nothing points at 1: pure teleport
