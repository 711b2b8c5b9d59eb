"""Second-wave analytics corpus: grouping sets, sliding windows, anti
joins, exact percentiles — operators beyond the reference's own surface
that a full engine exposes (SURVEY §2.4 noted their absence; the north
star requires them)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q22_rollup",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q22_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal aggregation (rollup): per-(flag,status),
    per-flag, and grand-total rows in one pass — Spark plans a single
    Expand + one shuffle, not three scans."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "cnt", "sum_price",
        )
    )


@query(
    "q40_cube",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q40_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four subtotal combinations in one pass
    (single Expand + one shuffle — the rollup's full-lattice sibling)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "cnt",
        )
    )


@query(
    "sx03_sliding_window",
    sql="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS cnt
    FROM (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             event_type
      FROM events
    ) GROUP BY ws, event_type
    """,
)
def sx03_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h event-time windows, batch face (streaming face:
    streaming/stream.py sliding_event_counts). Each event expands to
    exactly window/slide = 2 rows — the same Expand shape Spark's
    window() generates."""
    ev = t(spark, sf_dir, "events")
    trunc = F.date_trunc("hour", F.col("ts"))
    ws = F.explode(F.array(trunc, trunc - F.expr("INTERVAL 1 HOUR"))).alias("ws")
    return (
        ev.select(ws, "event_type")
        .groupBy(F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q23_anti_join",
    sql="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def q23_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no qualifying orders — the
    complement of the P5 semi-join; broadcastable build side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    return c.join(
        F.broadcast(o.select(F.col("o_custkey").alias("c_custkey"))),
        on="c_custkey", how="left_anti",
    ).select("c_custkey", "c_name")


@query(
    "q24_percentiles",
    sql="""
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q24_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per group — the
    exact form; at 100 TB swap in approx_percentile with a documented
    error bound (same plan shape, sketch-mergeable)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )
