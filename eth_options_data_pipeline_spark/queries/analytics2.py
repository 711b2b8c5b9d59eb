"""Third-wave corpus: subqueries, running windows, pivot, text
normalization, embedding near-dup, sketches, and the sink round-trip.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import vectors as vx
from eth_options_data_pipeline_spark.queries.fuzzy import _PLANES
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q25_scalar_subquery",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q25_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery as a predicate — planned as a
    broadcast of one aggregated row, no driver round-trip."""
    o = t(spark, sf_dir, "orders")
    avg = o.select((2 * F.avg("o_totalprice")).alias("thr"))
    return (
        o.join(F.broadcast(avg))
        .where(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q26_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders
    """,
)
def q26_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (rows unbounded preceding) — the
    cumulative-state shape behind the reference's append-log semantics."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "q27_pivot",
    sql="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) with a fixed value list — Spark's pivot
    compiles to exactly this conditional-aggregate plan; the explicit
    value list avoids the extra distinct-values job."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        )
    )


@query(
    "dx09_normalize_text",
    sql="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                      ' +', ' ', 'g'))) AS norm_len
    FROM documents
    """,
)
def dx09_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lowercase, strip non-alphanumerics, collapse
    whitespace) — the canonical pre-dedup cleaning transform, pure
    codegen expressions."""
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "))
    return docs.select("doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len"))


@query(
    "vx03_embedding_neardup",
    sql=f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {vx.lsh_bucket_sql("embedding::DOUBLE[]", _PLANES)} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           round({vx.cosine_sql('a.e', 'c.e')}, 6) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {vx.cosine_sql('a.e', 'c.e')} >= 0.25
    """,
)
def vx03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation (same Rademacher planes as vx02) + exact cosine
    threshold — the vector face of fuzzy dedup. The pair join runs
    only inside buckets, never across the full corpus."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    b = emb.withColumn("bucket", vx.lsh_bucket(F.col("e"), _PLANES))
    a = b.alias("a")
    c = b.alias("c")
    cos = vx.cosine(F.col("a.e"), F.col("c.e"))
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .where(cos >= 0.25)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"),
                F.round(cos, 6).alias("cos_sim"))
    )


@query("qx28_approx_sketches", sql=None)  # sketch outputs are engine-specific
def qx28_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for the 100 TB path: HLL distinct counts and
    t-digest-style approximate percentiles — mergeable partial states,
    one pass, bounded memory. No SQL oracle (sketch results are
    engine-specific); the driver records a rows-only check, and the
    exact counterparts (q14, q24) pin correctness."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("approx_p99_price"),
    )


@query(
    "q29_sink_roundtrip",
    sql="""
    SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_linestatus = 'F'
    GROUP BY l_returnflag
    """,
)
def q29_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S2 sink+source: write a filtered slice as parquet partitioned
    by the group key, read it back, aggregate — proving the partitioned
    append sink and partition-pruned read-back path end-to-end inside
    the oracle harness."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_linestatus") == "F")
    out = os.path.join(tempfile.mkdtemp(prefix="sink_rt_"), "t")
    li.select("l_returnflag", "l_quantity").write.mode("overwrite") \
        .partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
