"""PageRank vs an exact Python replica (same dangling-mass
redistribution, same iteration count), plus mass conservation."""

from __future__ import annotations

import pytest

from eth_options_data_pipeline_spark.operators.pagerank import pagerank

# 0 -> 1,2 ; 1 -> 2 ; 2 -> 0 ; 3 -> 2 ; 4 is dangling (only in-links)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 4)]
ITERS = 12
D = 0.85


def ref_pagerank(edges, iters, d):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {u: [v for s, v in edges if s == u] for u in nodes}
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        dangling = sum(rank[u] for u in nodes if not out[u])
        base = (1 - d) / n + d * dangling / n
        nxt = {u: base for u in nodes}
        for u in nodes:
            for v in out[u]:
                nxt[v] += d * rank[u] / len(out[u])
        rank = nxt
    return rank


def test_matches_replica(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, ITERS, D).collect()}
    want = ref_pagerank(EDGES, ITERS, D)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9)


def test_mass_conserved_and_ordering_sane(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, ITERS, D).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # node 0 drains node 2's whole rank (2 -> 0 is 2's only
    # out-link); node 3 has no in-links at all
    assert got[0] == max(got.values())
    assert got[3] == min(got.values())


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, 3).count() == 0
