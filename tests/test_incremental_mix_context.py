"""Unit tests for the round-5 part-2 operators: incremental aggregate
maintenance (merge == recompute, any batch split/order), temperature
mixing (weight law and determinism), and context-window pairs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.context_windows import (
    context_target_pairs,
)
from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, merge_states, partial_state,
)
from eth_options_data_pipeline_spark.operators.mixing import temperature_mix
from eth_options_data_pipeline_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_recompute_any_split(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    keys = ["o_orderpriority"]
    want = _rows(finalize(
        partial_state(orders, keys, "o_totalprice"), keys))
    # three-way split on an unrelated dimension, merged in two
    # different association orders
    s = [partial_state(orders.where(F.col("o_orderkey") % 3 == i),
                       keys, "o_totalprice") for i in range(3)]
    got1 = _rows(finalize(merge_states(keys, s[0], s[1], s[2]), keys))
    got2 = _rows(finalize(
        merge_states(keys, s[2], merge_states(keys, s[1], s[0])), keys))
    assert got1 == want and got2 == want


def test_temperature_mix_weight_law(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "source")
    out = temperature_mix(docs, "source", "doc_id", alpha=0.5)
    w = {r.source: r.mix_weight
         for r in out.select("source", "mix_weight").distinct().collect()}
    n = {r.source: r.cnt for r in
         docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    total = sum(n.values())
    z = sum(math.sqrt(v) for v in n.values())
    for s, ns in n.items():
        want = total * math.sqrt(ns) / z / ns
        assert abs(w[s] - want) < 1e-8, (s, w[s], want)
    # smaller sources get larger weights under alpha < 1
    smallest = min(n, key=n.get)
    largest = max(n, key=n.get)
    if n[smallest] < n[largest]:
        assert w[smallest] > w[largest]
    # expected output size ~ total (reshape, same size)
    cnt = out.count()
    assert abs(cnt - total) < 0.2 * total
    # deterministic: re-run is byte-identical
    again = temperature_mix(docs, "source", "doc_id", alpha=0.5)
    assert _rows(out.select("doc_id", "mix_copy")) == \
        _rows(again.select("doc_id", "mix_copy"))


def test_context_pairs_exact(spark):
    ev = spark.createDataFrame(
        [(1, i, f"2024-01-01 00:0{i}:00", f"e{i}") for i in range(4)]
        + [(2, 9, "2024-01-01 00:00:00", "solo")],
        "user_id long, event_id long, ts_s string, event_type string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    got = {r.event_id: (r.context, r.n_ctx, r.target)
           for r in context_target_pairs(ev, k=2).collect()}
    assert got[0] == ("", 0, "e0")
    assert got[1] == ("e0", 1, "e1")
    assert got[2] == ("e0 | e1", 2, "e2")
    assert got[3] == ("e1 | e2", 2, "e3")      # bounded at k=2
    assert got[9] == ("", 0, "solo")           # other key untouched


def test_temperature_mix_alpha_one_is_identity(spark, sf_small):
    """alpha=1 keeps natural proportions: w_s == 1.0 exactly for every
    source, so the mix is the input, one copy each."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "source")
    out = temperature_mix(docs, "source", "doc_id", alpha=1.0)
    assert out.where(F.col("mix_weight") != 1.0).count() == 0
    assert out.where(F.col("mix_copy") != 0).count() == 0
    assert out.count() == docs.count()
