"""Scalar-function breadth corpus: string and date/time function
coverage beyond the reference's F1-F14 set — the functions a user of a
complete engine reaches for daily, each pinned against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q33_string_funcs",
    sql="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0')      AS padded_key,
           upper(p_brand)                                AS brand_upper,
           translate(p_brand, '#', '-')                  AS brand_dashed,
           reverse(p_type)                               AS type_rev,
           left(p_name, 10)                              AS name_prefix,
           instr(p_type, 'BRUSHED')                      AS brushed_at,
           concat_ws('/', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           length(p_name) - length(replace(p_name, ' ', '')) AS n_spaces
    FROM part
    """,
)
def q33_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery: pad/case/translate/reverse/slice/
    locate/concat_ws/occurrence-count — all codegen expressions."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.upper("p_brand").alias("brand_upper"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.reverse("p_type").alias("type_rev"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.instr(F.col("p_type"), "BRUSHED").alias("brushed_at"),
        F.concat_ws("/", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit("")))).alias("n_spaces"),
    )


@query(
    "q34_date_funcs",
    sql="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')                  AS due_day,
           strftime(CAST(date_add(CAST(o_orderdate AS DATE), INTERVAL 1 MONTH) AS DATE),
                    '%Y-%m-%d')                                                   AS next_month_day,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')             AS month_end,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')  AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))         AS days_since_epoch95,
           extract(year FROM o_orderdate)                                        AS order_year,
           extract(quarter FROM o_orderdate)                                     AS order_quarter
    FROM orders WHERE o_orderkey % 37 = 0
    """,
)
def q34_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic battery: day/month adds (with month-end clamp),
    last_day, truncation, diffs, field extraction — the F8-F11 family
    generalized."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 37 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_day"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("next_month_day"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch95"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )
