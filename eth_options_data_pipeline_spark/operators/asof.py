"""As-of (point-in-time) join: for every probe row, the most recent
build-side row with build.ts <= probe.ts per key.

This is the generalized form of the reference's snapshot join
(main.py:279-308 derives Open/OI_Change by pairing each row with the
most recent prior state for the same SYMBOL — an as-of join where the
build side is the previous run). Spark has no ASOF JOIN operator; the
naive encodings both collapse at scale:

  * an inequality-only join (``a.key == b.key AND b.ts <= a.ts`` +
    keep-latest) plans as a broadcast-nested-loop / cartesian per key
    and explodes quadratically in rows per key;
  * per-row subqueries decorrelate into the same shape.

The scale form used here is union + ordered window:

  1. tag probe (1) and build (0) rows, union them column-aligned;
  2. one hash shuffle on the key, one sort by (ts, tag) per partition
     — build rows sort BEFORE probe rows at equal ts, giving the
     inclusive ``b.ts <= a.ts`` semantics;
  3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING
     .. CURRENT ROW carries the latest build payload forward;
  4. keep probe rows.

Cost: ONE shuffle + ONE sort over |probe| + |build| rows, regardless
of per-key density — the same complexity as the sorted-merge as-of
join in kdb/pandas (``merge_asof``), expressed relationally. Skewed
keys degrade to a big sorted partition, not a cross product; AQE skew
splitting cannot help a window, so extreme per-key skew is handled the
same way as W4 dedup (salt by coarse ts bucket, as-of within bucket,
then one cross-bucket fixup pass — not needed at testdata scale).

Build-side ties (same key, same ts) are pre-aggregated by the caller
to keep the result deterministic (the window's "last" would otherwise
depend on shuffle order within equal sort keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, build: DataFrame, on: str, ts: str,
              payload: list[str]) -> DataFrame:
    """Left as-of join: probe rows keep their columns plus, for each
    name in ``payload``, the value from the latest build row with
    ``build[ts] <= probe[ts]`` for the same ``on`` key (null when no
    such row exists).

    ``build`` must be unique per (on, ts) — pre-aggregate ties first.
    """
    probe_cols = probe.columns
    tagged_probe = probe.withColumn("_asof_tag", F.lit(1))
    for c in payload:
        tagged_probe = tagged_probe.withColumn(c, F.lit(None))
    tagged_build = build.select(
        on, ts, *payload).withColumn("_asof_tag", F.lit(0))
    for c in probe_cols:
        if c not in (on, ts):
            tagged_build = tagged_build.withColumn(c, F.lit(None))
    u = tagged_probe.unionByName(tagged_build)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in payload:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.where(F.col("_asof_tag") == 1).drop("_asof_tag")
