"""Sketch algebra over HLL: distinct-cardinality set operations
between GROUPS without re-scanning raw data.

"How many users did segments A and B share last week?" is a set-
INTERSECTION cardinality. HLL sketches union natively
(``hll_union_agg``) but cannot intersect; the standard workaround —
what Druid/Presto/Redshift document for their HLL types — is
inclusion-exclusion over unions:

    |A ∩ B| = |A| + |B| - |A ∪ B|

computed entirely on the per-group sketches. Error grows with the
union size (theta sketches bound it better but need the Datasketches
theta type, not exposed through Spark's built-ins), so the estimate is
floored at 0 and the relative-error regime is the caller's contract —
the tests quantify it against exact counts.

Scale shape: one pass over the fact table builds one sketch per
group (mergeable partials, map-side combined); every pairwise overlap
after that is sketch-register math on the tiny sketch table — the raw
data is never rescanned, which is the entire point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_sketches(df: DataFrame, group_col: str, distinct_col: str) -> DataFrame:
    """One HLL sketch of ``distinct_col`` per group — the only scan of
    the raw table."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(distinct_col).alias("sketch"),
    ).withColumn("approx_distinct", F.hll_sketch_estimate(F.col("sketch")))


def pairwise_overlap(sketches: DataFrame, group_col: str) -> DataFrame:
    """Estimated |A∩B|, |A∪B| and Jaccard for every unordered group
    pair, from sketches alone.

    The self-join runs on the sketch table (|groups| rows, a few KB
    each) — broadcast by the planner at any realistic group count.
    Inclusion-exclusion can go negative within HLL error; intersections
    clamp at 0.
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"),
        F.col("sketch").alias("sk_a"),
        F.col("approx_distinct").alias("n_a"))
    b = sketches.select(
        F.col(group_col).alias("group_b"),
        F.col("sketch").alias("sk_b"),
        F.col("approx_distinct").alias("n_b"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    union_est = F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b")))
    inter_est = F.greatest(F.col("n_a") + F.col("n_b") - union_est, F.lit(0.0))
    return pairs.select(
        "group_a", "group_b", "n_a", "n_b",
        union_est.alias("union_est"),
        inter_est.alias("inter_est"),
        F.when(union_est > 0, inter_est / union_est).otherwise(F.lit(0.0)).alias("jaccard_est"),
    )


def overlap_matrix(df: DataFrame, group_col: str, distinct_col: str) -> DataFrame:
    """End-to-end: raw table -> per-group sketches -> pairwise overlap
    estimates. The sketch table is cached before the self-join —
    without it Catalyst clones the aggregation subtree into both join
    sides and the raw table is scanned twice; with it the raw scan runs
    once and the join replays |groups| cached rows."""
    from eth_options_data_pipeline_spark.operators import scratch
    return pairwise_overlap(
        scratch.scoped_cache(group_sketches(df, group_col, distinct_col),
                             "sketch_algebra.overlap_matrix"),
        group_col)
