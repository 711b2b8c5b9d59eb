"""Partition-scoped MERGE (upsert) into a partitioned parquet table,
without a table format's transaction log.

Semantics: for each key in ``updates``, the matched target row is
replaced; unmatched keys are inserted. Equivalent to Delta's
``MERGE WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
for a whole-row update — the only merge shape the reference pipeline
needs (its cumulative table is keyed by SYMBOL+Date and re-runs
replace rows, `main.py:252-338`).

Why not read-union-rewrite the whole table: at 100 TB the cumulative
table is thousands of date partitions and an update batch touches a
handful. The merge must therefore:

1. find AFFECTED partitions — distinct partition values present in
   ``updates`` (an aggregation of the small side only; the target is
   not scanned for this),
2. read ONLY those partitions back (partition pruning via an `isin`
   filter on the partition column — verified to prune in the test),
3. anti-join out the updated keys, union the update rows,
4. rewrite only those partitions with dynamic partition overwrite —
   untouched partitions' files are never opened, moved, or rewritten
   (asserted on file mtimes in the test).

The updates side is collected only to the distinct-partition-values
list (bounded by the table's partition count, not data size). With
update batches that are small relative to a partition, the dominant
cost is re-writing the affected partitions — the floor any
copy-on-write format (Delta, Iceberg COW) pays too.

Crash safety: dynamic partition overwrite stages files under the
Hadoop committer before swapping partition directories, so a crash
mid-write leaves the old partition contents serving. A torn multi-
partition swap can leave SOME partitions updated — rerunning the
same merge converges (the operation is idempotent: replaced rows
replace to the same values, inserts anti-join to nothing).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(spark: SparkSession, path: str, updates: DataFrame,
                 keys: tuple[str, ...], partition_col: str) -> int:
    """Upsert ``updates`` into the parquet table at ``path``.

    Returns the number of affected partitions. ``keys`` must not
    contain NULLs on the update side (a NULL key never matches and
    would insert a duplicate on every rerun); raises if one is found.
    """
    if partition_col not in updates.columns:
        raise ValueError(f"updates must carry partition column {partition_col!r}")
    # ONE action answers both pre-write questions — the affected
    # partition values AND "does any update row carry a NULL key" —
    # instead of a limit-1 null probe plus a separate distinct
    # (r17, guide §1.2: the null probe scanned the whole updates side
    # in the common no-null case anyway, so folding it into the
    # per-partition aggregate removes a full pass; result rows stay
    # bounded by the table's partition count). The error still fires
    # BEFORE any write.
    null_col = (F.greatest(*[F.col(k).isNull() for k in keys])
                if len(keys) > 1 else F.col(keys[0]).isNull())
    stats = (updates.groupBy(partition_col)
             .agg(F.max(null_col.cast("int")).alias("_null_key"))
             .collect())
    if any(r["_null_key"] for r in stats):
        raise ValueError("NULL merge key in updates — rerun would duplicate")
    parts = [r[0] for r in stats]
    if not parts:
        return 0

    target = spark.read.parquet(path).where(
        F.col(partition_col).isin(parts))
    survivors = target.join(
        F.broadcast(updates.select(*keys).distinct()),
        list(keys), "left_anti")
    merged = survivors.unionByName(updates.select(*target.columns))
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    spark.catalog.refreshByPath(path)
    return len(parts)


def merge_delete(spark: SparkSession, path: str, tombstones: DataFrame,
                 keys: tuple[str, ...], partition_col: str) -> int:
    """Partition-scoped DELETE: remove every target row matching a
    key in ``tombstones`` (which must carry ``partition_col`` so only
    the partitions that can contain the key are touched — a
    right-to-be-forgotten delete at 100 TB cannot afford a full-table
    rewrite). Returns the number of partitions rewritten.

    Same crash/idempotency posture as ``merge_upsert``: dynamic
    overwrite swaps whole partition directories; rerunning the same
    delete is a no-op. Trap handled explicitly: dynamic overwrite only
    replaces partitions PRESENT in the written data, so a partition
    whose every row is deleted would silently keep its old files —
    those partitions are removed directory-by-directory instead.
    """
    if partition_col not in tombstones.columns:
        raise ValueError(
            f"tombstones must carry partition column {partition_col!r}")
    parts = [r[0] for r in
             tombstones.select(partition_col).distinct().collect()]
    if not parts:
        return 0
    target = spark.read.parquet(path).where(
        F.col(partition_col).isin(parts))
    survivors = target.join(
        F.broadcast(tombstones.select(*keys).distinct()),
        list(keys), "left_anti").cache()
    try:
        # compare as strings: partition inference may read the column
        # back typed (e.g. date) while tombstones carry the raw string,
        # and the directory name is the string form either way
        alive = {str(r[0]) for r in
                 survivors.select(partition_col).distinct().collect()}
        if alive:
            (
                survivors.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(path)
            )
        for part in (p for p in parts if str(p) not in alive):
            part_dir = os.path.join(path, f"{partition_col}={part}")
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
    finally:
        survivors.unpersist()
    spark.catalog.refreshByPath(path)
    return len(parts)
