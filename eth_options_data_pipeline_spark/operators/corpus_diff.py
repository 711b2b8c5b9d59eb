"""Corpus snapshot diff — what changed between two pipeline runs.

An incremental training-data pipeline re-lands the corpus on every
run; the operational question is "what did this run actually change?"
(docs added / removed / rewritten / untouched), both as per-doc status
rows feeding downstream incremental work (re-embed only changed docs,
re-screen only added ones — see incremental_dedup.py) and as a
one-line audit summary.

Scale shape: each side collapses to (id, digest) BEFORE the join —
the document bodies never shuffle; the diff is one full-outer hash
join on the id. Change detection compares content digests, so "same
bytes re-landed" is correctly `unchanged` even if file layout moved
(compaction, re-partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digested(df: DataFrame, id_col: str, content_cols: list[str],
              side: str) -> DataFrame:
    digest = F.md5(F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                  for c in content_cols]))
    return df.select(F.col(id_col), digest.alias(f"_d_{side}"))


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  content_cols: list[str] | None = None) -> DataFrame:
    """(id, status) for every doc in either snapshot; status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    content_cols = content_cols or ["text"]
    o = _digested(old, id_col, content_cols, "old")
    n = _digested(new, id_col, content_cols, "new")
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("_d_old").isNull(), "added")
             .when(F.col("_d_new").isNull(), "removed")
             .when(F.col("_d_old") != F.col("_d_new"), "changed")
             .otherwise("unchanged").alias("status"),
        )
    )


def diff_summary(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                 content_cols: list[str] | None = None) -> DataFrame:
    """One row per status with counts — the audit line for a run."""
    return (
        snapshot_diff(old, new, id_col, content_cols)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )
