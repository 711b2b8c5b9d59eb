"""Z-order (Morton) clustering for multi-column scan pruning.

Sorting a table by one column gives parquet row-group min/max pruning
on that column and destroys it for every other; interleaving the bits
of two (or more) rank-normalized keys gives locality in ALL of them
at once — each file covers a small rectangle of the key space instead
of a thin stripe, so selective filters on EITHER column skip most
files. This is Delta/Iceberg OPTIMIZE ZORDER BY, built from stock
operators: rank -> bit-interleave -> repartitionByRange + sort on the
Morton key.

Rank normalization (ntile over each key) rather than raw values makes
the interleave robust to skew and to arbitrary numeric ranges — the
classic practical choice. 16 bits per dimension bounds the key to a
long for up to 4 dimensions.

tests/test_zorder.py verifies the claim against the parquet footers
themselves (per-file min/max width on BOTH columns, via pyarrow) —
not just the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BITS = 16


def _interleave(cols: list, bits: int = BITS):
    """Morton key: bit j of column i lands at position j*n_cols + i."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            out = out + (bit.cast("long") * F.lit(1 << (j * n + i)).cast("long"))
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = BITS):
    """Morton key column over rank-normalized key columns.

    Note: the ntile ranking uses one global-ordering window per key
    column at write time — acceptable for a maintenance/compaction
    job (Delta's OPTIMIZE pays the same global sort); not for a hot
    path.
    """
    ranked = []
    for c in cols:
        w = Window.orderBy(F.col(c))
        ranked.append(F.ntile(1 << bits).over(w) - 1)
    return _interleave(ranked, bits)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 8, bits: int = BITS) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``cols`` — range-partitioned on the Morton key so each
    file owns a compact key-space rectangle."""
    keyed = df.withColumn("_z", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(path)
    )
