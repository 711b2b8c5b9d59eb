"""Heavy hitters vs exact counting: returned counts are exact, the
top-k equals the exact top-k under the same tie-break, and the
frequency guarantee (every item above total/(capacity+1) survives
pass 1) holds even with a deliberately tiny capacity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.heavy_hitters import (
    heavy_hitters, partition_candidates)
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _token_stream(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(F.explode(
        F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))


def _exact(spark):
    toks = _token_stream(spark)
    return Counter({r.w: r["count"] for r in
                    toks.groupBy("w").count().collect()})


def test_topk_matches_exact(spark):
    toks = _token_stream(spark)
    exact = _exact(spark)
    got, _ = heavy_hitters(toks, "w", k=15, capacity=500)
    rows = got.collect()
    # exact top-15 under (count desc, word asc)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.w, r.cnt) for r in rows] == want


def test_counts_are_exact_even_with_tiny_capacity(spark):
    toks = _token_stream(spark)
    exact = _exact(spark)
    got, _ = heavy_hitters(toks, "w", k=10, capacity=5)
    for r in got.collect():
        assert r.cnt == exact[r.w]


def test_guarantee_above_threshold(spark):
    toks = _token_stream(spark)
    exact = _exact(spark)
    total = sum(exact.values())
    capacity = 40
    cands = {r.w for r in
             partition_candidates(toks, "w", capacity).distinct().collect()}
    bar = total / (capacity + 1)
    must_survive = {w for w, c in exact.items() if c > bar}
    assert must_survive, "test corpus should have at least one hot token"
    assert must_survive <= cands
    # and the candidate set is small — the point of the summary pass
    n_parts = toks.rdd.getNumPartitions()
    assert len(cands) <= capacity * n_parts
