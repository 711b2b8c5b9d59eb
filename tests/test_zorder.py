"""Z-order clustering verified against the parquet footers: files of
a Z-ordered rewrite must cover narrow ranges on BOTH key columns,
where a single-column sort leaves the second column's per-file ranges
as wide as the whole domain."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.zorder import write_zordered
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _file_spans(path: str, col: str) -> list[float]:
    """Per-file (max - min) width of ``col`` from parquet metadata."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            spans.append(float(max(maxs) - min(mins)))
    return spans


def test_zorder_narrows_file_ranges_on_both_columns(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice")

    z = str(tmp_path / "zorder")
    single = str(tmp_path / "single")
    write_zordered(li, z, ["l_orderkey", "l_partkey"], n_files=8)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(single)
    )

    domain = {
        c: r["mx"] - r["mn"]
        for c in ("l_orderkey", "l_partkey")
        for r in [li.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).collect()[0]]
    }

    def mean(xs):
        return sum(xs) / len(xs)

    # the single-column layout prunes perfectly on its sort column but
    # every file spans ~the full l_partkey domain
    assert mean(_file_spans(single, "l_orderkey")) < 0.35 * domain["l_orderkey"]
    assert mean(_file_spans(single, "l_partkey")) > 0.8 * domain["l_partkey"]

    # the Z-ordered layout is materially narrower than the full domain
    # on BOTH columns (rectangles, not stripes)
    z_ok = mean(_file_spans(z, "l_orderkey"))
    z_pk = mean(_file_spans(z, "l_partkey"))
    assert z_ok < 0.7 * domain["l_orderkey"]
    assert z_pk < 0.7 * domain["l_partkey"]
    # and beats the single-column layout on the non-sorted column
    assert z_pk < 0.8 * mean(_file_spans(single, "l_partkey"))


def test_zorder_preserves_rows(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice")
    out = str(tmp_path / "z2")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    a = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    b = back.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert abs(a - b) < 1e-6
