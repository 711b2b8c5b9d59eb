"""Salted-join equivalence on skewed data + partition compaction."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.skew import salted_join
from eth_options_data_pipeline_spark.pipeline import HOURLY, run
from eth_options_data_pipeline_spark.sinks import append_snapshot, compact_partition
from eth_options_data_pipeline_spark.sources import synthetic_tickers

AS_OF = dt.datetime(2025, 10, 27, 12, 30)


def test_salted_join_equals_plain_join(spark):
    # 90% of the large side lands on one hot key
    large = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise((F.col("id") % 50) + 2).alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(1, 60).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = large.join(other, "k")
    salted = salted_join(large, other, on="k", salts=8)
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    # left join preserves unmatched rows too
    plain_l = large.join(other, "k", "left")
    salted_l = salted_join(large, other, on="k", salts=8, how="left")
    assert plain_l.exceptAll(salted_l).count() == 0
    assert salted_l.exceptAll(plain_l).count() == 0


def test_compact_partition_preserves_rows(spark, tmp_path):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    path = str(tmp_path / "chain")
    for _ in range(4):  # four hourly appends -> many small files
        append_snapshot(out, path)
    part = f"Date={AS_OF.date().isoformat()}"
    files_before = glob.glob(f"{path}/{part}/*.parquet")
    before = spark.read.parquet(path).collect()
    n = compact_partition(spark, path, part, target_files=1)
    files_after = glob.glob(f"{path}/{part}/*.parquet")
    after = spark.read.parquet(f"{path}/{part}").collect()
    assert n == len(before) == len(after)
    assert len(files_after) == 1 and len(files_before) >= 4
    assert sorted(map(tuple, (r[:5] for r in before))) == sorted(map(tuple, (r[:5] for r in after)))


def _make_table(spark, tmp_path, appends=2):
    out = run(synthetic_tickers(spark, AS_OF.date()), None, HOURLY, AS_OF)
    path = str(tmp_path / "chain")
    for _ in range(appends):
        append_snapshot(out, path)
    part = f"Date={AS_OF.date().isoformat()}"
    return path, part, spark.read.parquet(path).count()


def test_recovery_cleans_orphan_tmp(spark, tmp_path):
    """Crash after the tmp write, before any rename: partition intact,
    recovery drops the orphan."""
    import os
    from eth_options_data_pipeline_spark.sinks import recover_compaction

    from eth_options_data_pipeline_spark.sinks import _scratch_name

    path, part, n = _make_table(spark, tmp_path)
    tmp = os.path.join(path, f"_compact_tmp_{_scratch_name(part)}")
    spark.read.parquet(os.path.join(path, part)).coalesce(1).write.parquet(tmp)
    res = recover_compaction(path)
    assert res["cleaned"] == [f"_compact_tmp_{_scratch_name(part)}"] and res["restored"] == []
    assert not os.path.exists(tmp)
    assert spark.read.parquet(path).count() == n


def test_recovery_restores_missing_partition(spark, tmp_path):
    """Crash between the two renames: the partition is missing and the
    data sits in _compact_old_*; recovery must restore it."""
    import os
    from eth_options_data_pipeline_spark.sinks import recover_compaction

    from eth_options_data_pipeline_spark.sinks import _scratch_name

    path, part, n = _make_table(spark, tmp_path)
    os.rename(os.path.join(path, part),
              os.path.join(path, f"_compact_old_{_scratch_name(part)}"))
    # the table now silently serves without the partition (the
    # '='-free encoded scratch name hides the moved-aside copy from
    # listing AND partition inference — a raw 'col=value' suffix would
    # be inferred as a bogus partition column and read as live data) —
    # the failure mode recovery exists to fix; n > 0 rows are missing
    assert n > 0
    # without the refresh, the session's file-status cache can keep
    # serving the moved-aside files — invalidate to observe disk truth
    spark.catalog.refreshByPath(path)
    try:
        served = spark.read.parquet(path).count()
    except Exception:
        served = 0  # an empty table root may instead fail schema inference
    assert served == 0
    res = recover_compaction(path)
    spark.catalog.refreshByPath(path)
    assert res["restored"] == [part]
    assert spark.read.parquet(path).count() == n


def test_recovery_drops_stale_old_when_partition_live(spark, tmp_path):
    """Crash after the second rename, before cleanup: compacted data is
    live; recovery just deletes the old copy."""
    import os
    import shutil
    from eth_options_data_pipeline_spark.sinks import recover_compaction

    from eth_options_data_pipeline_spark.sinks import _scratch_name

    path, part, n = _make_table(spark, tmp_path)
    enc = f"_compact_old_{_scratch_name(part)}"
    shutil.copytree(os.path.join(path, part), os.path.join(path, enc))
    res = recover_compaction(path)
    assert res["cleaned"] == [enc]
    assert not os.path.exists(os.path.join(path, enc))
    assert spark.read.parquet(path).count() == n
