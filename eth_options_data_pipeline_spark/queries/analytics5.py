"""Sixth-wave corpus: correlated subqueries and theta self-joins.

Float-safety note (q35): quantities are integer-valued doubles, so
group sums are exactly representable and avg = sum/count is the same
IEEE operation on identical bits in both engines — the correlated
threshold comparison is deterministic without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q35_correlated_scalar",
    sql="""
    SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (
      SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def q35_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): rows below half
    their part's average quantity. Catalyst decorrelates into an
    aggregate + equi-join — one shuffle on l_partkey, not a per-row
    subquery execution."""
    li = t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg_qty"))
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q36_theta_self_join",
    sql="""
    SELECT DISTINCT a.o_custkey
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND datediff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)) BETWEEN 0 AND 7
    """,
)
def q36_theta_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta self-join (J4's generalized shape): customers with two
    orders within 7 days. Equi-part (o_custkey) drives the shuffle;
    the range predicate evaluates post-join inside the partition."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    a, b = o.alias("a"), o.alias("b")
    dd = F.datediff(F.col("b.d"), F.col("a.d"))
    return (
        a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
               & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
               & dd.between(0, 7))
        .select(F.col("a.o_custkey").alias("o_custkey"))
        .distinct()
    )
