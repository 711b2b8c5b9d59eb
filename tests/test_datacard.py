"""Corpus data card: roll-up levels consistent with direct group-bys,
single-scan plan, sane rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.datacard import TOTAL, corpus_datacard
from eth_options_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def card(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    return docs, corpus_datacard(docs).cache()


def test_levels_present_and_consistent(spark, card):
    docs, dc = card
    rows = dc.collect()
    levels = {(r["source"] == TOTAL, r["lang"] == TOTAL) for r in rows}
    assert levels == {(False, False), (False, True), (True, False), (True, True)}

    total = [r for r in rows if r["source"] == TOTAL and r["lang"] == TOTAL]
    assert len(total) == 1
    assert total[0]["n_docs"] == docs.count()

    # per-source level == a direct groupBy on the raw table
    want = {r["source"]: (r["n"], r["tok"]) for r in
            docs.groupBy("source").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("tok"),
            ).collect()}
    got = {r["source"]: (r["n_docs"], r["n_tokens"]) for r in rows
           if r["source"] != TOTAL and r["lang"] == TOTAL}
    assert got == want

    # cells sum to their roll-up
    per_cell = sum(r["n_docs"] for r in rows
                   if r["source"] != TOTAL and r["lang"] != TOTAL)
    assert per_cell == total[0]["n_docs"]


def test_rates_bounded_and_percentiles_ordered(spark, card):
    _, dc = card
    for r in dc.collect():
        assert 0.0 <= r["pii_email_rate"] <= 1.0
        assert 0.0 <= r["repeat_doc_rate"] <= 1.0
        assert 0.0 <= r["dup_doc_rate"] <= 1.0
        assert r["p50_doc_tokens"] <= r["p90_doc_tokens"]
        assert r["approx_unique"] <= r["n_docs"] * 1.05  # HLL slack


def test_single_scan_single_exchange(spark, sf_small):
    # the card fixture cached the identical plan; drop it so the plan
    # under inspection is the real scan, not an InMemoryRelation match
    spark.catalog.clearCache()
    docs = load_table(spark, sf_small, "documents")
    plan = corpus_datacard(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan  # grouping sets share the one scan
    assert plan.count("Exchange hashpartitioning") == 1
