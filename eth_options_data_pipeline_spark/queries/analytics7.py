"""Eighth-wave corpus: remaining classic TPC-H idioms — distinct-count
per attribute group (Q16), avg-threshold + anti-join cohort (Q22),
argmax via join-back (Q2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q41_supplier_variety",
    sql="""
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS n_suppliers,
           count(*) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand, p.p_size
    """,
)
def q41_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count per attribute group after a
    dimension join — the broadcast join keeps the fact scan
    shuffle-free. The distinct is two-stage (pre-group on the full key
    including suppkey, then count rows / sum partial counts) instead
    of countDistinct-next-to-count: mixing a distinct and a plain agg
    makes Catalyst EXPAND every input row into two, doubling the rows
    through the wide stage; the pre-group form partial-aggregates
    map-side and shuffles at most one row per (brand, size, suppkey)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_size") >= 20)
    per_supp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_supp.groupBy("p_brand", "p_size")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("_c").alias("n_lineitems"),
        )
    )


@query(
    "q42_dormant_rich_customers",
    sql="""
    SELECT c.c_nationkey % 5 AS cohort,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY cohort
    """,
)
def q42_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti
    join + cohort aggregation — above-average-balance customers with
    no jumbo (>300k) orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    avg_bal = c.where(F.col("c_acctbal") > 0).select(F.avg("c_acctbal").alias("thr"))
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("thr"))
    dormant = rich.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        on="c_custkey", how="left_anti",
    )
    return (
        dormant.groupBy((F.col("c_nationkey") % 5).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "q43_argmax_join_back",
    sql="""
    WITH best AS (
      SELECT c_nationkey, max(c_acctbal) AS best_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_nationkey, c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c JOIN best b
      ON b.c_nationkey = c.c_nationkey AND c.c_acctbal = b.best_bal
    """,
)
def q43_argmax_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group max computed once, joined back to
    recover the full argmax rows (keeps ties, unlike row_number) — the
    aggregate side is tiny and broadcasts."""
    c = t(spark, sf_dir, "customer")
    best = c.groupBy(F.col("c_nationkey").alias("bk")).agg(F.max("c_acctbal").alias("best_bal"))
    return (
        c.join(F.broadcast(best),
               (c.c_nationkey == F.col("bk")) & (c.c_acctbal == F.col("best_bal")))
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


@query(
    "q45_asof_join",
    sql="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           c.value AS click_value,
           coalesce(p.purchase_value, -1.0) AS purchase_value,
           coalesce(epoch_us(c.ts) - epoch_us(p.ts), -1) AS micros_since_purchase
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def q45_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each click paired with the user's
    most recent purchase at-or-before it — the generalized form of the
    reference's snapshot join (main.py:279-308: current row vs latest
    prior state per SYMBOL). Implemented with operators/asof.py's
    union + ordered-window shape: ONE shuffle and ONE sort over
    |clicks| + |purchases| rows regardless of per-key density, where
    the naive inequality join explodes quadratically. The oracle is
    DuckDB's native ASOF LEFT JOIN — a rare case where the checked
    operator exists natively in the oracle engine but not in Spark.
    Build ties at the same (user_id, ts) are pre-aggregated (max) so
    "latest" is deterministic on both engines; no-match probes take
    sentinel values (never-null doubles per the hash contract)."""
    from eth_options_data_pipeline_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    joined = asof_join(clicks, purchases, on="user_id", ts="ts",
                       payload=["purchase_value", "purchase_ts"])
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("value").alias("click_value"),
        F.coalesce("purchase_value", F.lit(-1.0)).alias("purchase_value"),
        F.coalesce(F.unix_micros(F.col("ts")) - F.unix_micros(F.col("purchase_ts")),
                   F.lit(-1)).alias("micros_since_purchase"),
    )
