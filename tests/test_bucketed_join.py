"""Bucketed tables: a join between two tables bucketed on the join key
with the same bucket count must plan WITHOUT a shuffle exchange, and
return the same rows as the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.sinks import write_bucketed
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")

    write_bucketed(li, "b_lineitem", str(tmp_path / "b_li"), "l_orderkey")
    write_bucketed(o, "b_orders", str(tmp_path / "b_o"), "l_orderkey")
    # disable broadcast so the plan must use the bucket layout (a
    # broadcast join would be trivially exchange-free and prove nothing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        joined = bl.join(bo, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

        got = joined.count()
        want = li.join(o, "l_orderkey").count()
        assert got == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_aggregation_is_shuffle_free(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity")
    write_bucketed(li, "b_li_agg", str(tmp_path / "b_li_agg"), "l_orderkey")
    try:
        agg = spark.table("b_li_agg").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        a = {r["l_orderkey"]: r["q"] for r in agg.collect()}
        b = {r["l_orderkey"]: r["q"] for r in
             li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")
