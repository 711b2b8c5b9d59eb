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
    shuffle-free; the distinct-count is the only wide stage."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_size") >= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
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
