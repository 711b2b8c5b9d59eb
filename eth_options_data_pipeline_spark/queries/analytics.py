"""Second-wave analytics corpus: grouping sets (rollup + cube) —
operators beyond the reference's own surface that a full engine exposes
(SURVEY §2.4 noted their absence; the north star requires them).

Round-2 consolidation: former q22_rollup + q40_cube are one query
(``q22_rollup_cube``, ``mode`` tag); former q23_anti_join's left-anti
facet lives on in q42_dormant_rich_customers (analytics7.py), former
q24_percentiles moved into q14_agg_battery (corpus.py), and former
sx03_sliding_window into sx01_windowed_aggs (extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q22_rollup_cube",
    sql="""
    SELECT 'rollup' AS mode,
           coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube',
           coalesce(l_returnflag, 'ALL'),
           coalesce(l_linestatus, 'ALL'),
           count(*),
           round(sum(l_extendedprice), 2)
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q22_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set aggregation, both lattices (``mode`` tag): ROLLUP
    (per-(flag,status), per-flag, grand total) and CUBE (the full
    lattice incl. per-status). Each plans as a single Expand + one
    shuffle — not N scans; at 100 TB the Expand factor (3 or 4 grouping
    sets) is the only cost multiplier. Former q22_rollup + q40_cube."""
    li = t(spark, sf_dir, "lineitem")

    def face(mode, grouped):
        return (
            grouped.agg(F.count(F.lit(1)).alias("cnt"),
                        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
            .select(
                F.lit(mode).alias("mode"),
                F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
                F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
                "cnt", "sum_price",
            )
        )

    return face("rollup", li.rollup("l_returnflag", "l_linestatus")).unionByName(
        face("cube", li.cube("l_returnflag", "l_linestatus"))
    )
