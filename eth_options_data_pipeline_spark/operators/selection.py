"""Token-budget corpus selection: keep the best documents until a
token budget is spent.

"Train on the best 500B tokens of this 5T-token crawl" is a
cumulative-sum cutoff over a quality ordering: sort by (quality desc,
id) and keep every doc whose RUNNING token total stays within budget.
The running sum makes the boundary exact and deterministic — unlike
per-doc probability sampling, re-runs pick the identical corpus, and
the id tie-break makes equal-quality orderings stable.

Scale shape — a distributed prefix sum, NOT a global window. The
naive ``sum().over(Window.orderBy(...))`` with no partition key drags
the entire corpus through one window partition (Spark even warns); at
100 TB that is a single-task sort. Instead:

  1. range-repartition on the ordering key (the balanced global sort
     Spark already knows how to do) + sortWithinPartitions;
  2. per-partition running sums — a window PARTITIONED BY the physical
     partition id, so every task scans only its own slice;
  3. per-partition totals (one tiny aggregate: |partitions| rows)
     turned into exclusive prefix offsets and broadcast-joined back.

The result is exact regardless of where the range boundaries fall,
because the (quality desc, id) order is total; only step 3's
|partitions|-row table ever leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_to_budget(docs: DataFrame, quality_col: str, token_col: str,
                     budget: int, id_col: str = "doc_id",
                     num_partitions: int | None = None) -> DataFrame:
    """Docs whose cumulative ``token_col`` (in quality-desc, id-asc
    order) stays within ``budget``. The first doc that would overflow
    is EXCLUDED (strict "at most N tokens"); a doc larger than the
    whole remaining budget is never kept. Adds ``cum_tokens`` (this
    doc's running total, itself <= budget) for downstream packing."""
    order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    ranked = docs.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *order
    ).sortWithinPartitions(*order).withColumn("_pid", F.spark_partition_id())

    local_w = (Window.partitionBy("_pid").orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranked.withColumn("_cum_local", F.sum(F.col(token_col)).over(local_w))

    # exclusive prefix offsets over the tiny per-partition totals table
    totals = local.groupBy("_pid").agg(F.sum(F.col(token_col)).alias("_total"))
    off_w = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.withColumn(
        "_offset", F.sum("_total").over(off_w) - F.col("_total")).drop("_total")

    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_tokens", F.col("_cum_local") + F.col("_offset"))
        .where(F.col("cum_tokens") <= budget)
        .drop("_pid", "_cum_local", "_offset")
    )
