"""Round-5 corpus faces, part 2: temperature mixing (dx51),
context→target pair construction (dx52), incremental aggregate
maintenance (dx53), and small-file compaction (qx47).

dx51 derives mT5-style multinomial temperature weights (p(s) ∝
n_s^0.5) from the corpus's own source histogram, entirely in-plan
(operators/mixing.py temperature_mix) — the mixing face dx29 takes
weights as GIVENS; this one computes them.

dx52 mines next-action training pairs from the event log: previous-5
event types as the context string, the row's own type as the target
(operators/context_windows.py) — the SFT-pair shape over
interaction data.

dx53 maintains a grouped aggregate by merging algebraic partial
states (count/sum/min/max in exact integer cents) from two disjoint
slices; the oracle recomputes from scratch, checking the maintenance
invariant merge(partial(A), partial(B)) == aggregate(A ∪ B)
(operators/incremental_agg.py).

qx47 compacts a 64-small-file parquet tree into target-sized files
and proves the rewrite lossless: the face returns the post-compaction
read-back (with per-row text digests), the oracle reads the original
table (operators/compaction.py). Reference analogue: the reference
appends one snapshot per run to its history sink (deltaweekly.py's
daily append) — the layout this operator exists to repair.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.compaction import compact
from eth_options_data_pipeline_spark.operators.context_windows import (
    context_target_pairs,
)
from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, merge_states, partial_state,
)
from eth_options_data_pipeline_spark.operators.mixing import temperature_mix
from eth_options_data_pipeline_spark.operators.order_stats import (
    exact_quantiles,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table


# ------------------------------------------- temperature mixing (dx51)

_TMIX_ALPHA = 0.5

_TMIX_SQL = f"""
    WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
    z AS (SELECT sum(pow(ns, {_TMIX_ALPHA})) AS z, sum(ns) AS nt FROM n),
    w AS (
      SELECT source,
             round(nt * pow(ns, {_TMIX_ALPHA}) / z / ns, 9) AS mix_weight
      FROM n, z
    ),
    c AS (
      SELECT d.doc_id, d.source, w.mix_weight,
             CAST(floor(w.mix_weight) AS BIGINT)
             + CASE WHEN CAST(('0x' || substr(md5(
                      'tmix|' || d.source || '|' || CAST(d.doc_id AS VARCHAR)
                    ), 1, 13)) AS BIGINT) / 4503599627370496.0
                    < w.mix_weight - floor(w.mix_weight)
                    THEN 1 ELSE 0 END AS cop
      FROM documents d JOIN w USING (source)
    )
    SELECT doc_id, source, mix_weight,
           CAST(unnest(range(0, cop)) AS INT) AS mix_copy
    FROM c
"""


@query("dx51_temperature_mix", sql=_TMIX_SQL)
def dx51_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing: weights n_s^0.5 derived
    from the live source histogram (sources-row aggregate broadcast
    back onto the fact scan — no collect), materialized as exact
    integer repeats + a seeded fractional hash slice. Weight doubles
    are rounded to 9 decimals BEFORE the floor/frac split so the copy
    decision is engine-independent."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = temperature_mix(docs, source_col="source", id_col="doc_id",
                          alpha=_TMIX_ALPHA, seed="tmix")
    return out.select("doc_id", "source", "mix_weight",
                      F.col("mix_copy").cast("int").alias("mix_copy"))


# --------------------------------------- context→target pairs (dx52)

_CTX_K = 5

_CTX_SQL = f"""
    SELECT user_id, event_id,
           coalesce(array_to_string(list(event_type) OVER f, ' | '), '')
             AS context,
           CAST(coalesce(len(list(event_type) OVER f), 0) AS INT) AS n_ctx,
           event_type AS target
    FROM events
    WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_CTX_K} PRECEDING AND 1 PRECEDING)
"""


@query("dx52_context_windows", sql=_CTX_SQL)
def dx52_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-action pair mining: per event, the user's previous 5 event
    types (event-time order) joined as the context, the event's own
    type as the target. One shuffle on the key; the context list and
    its length share one sliding frame → a single Window node
    (plan-asserted in test_plans.py)."""
    ev = load_table(spark, sf_dir, "events")
    return context_target_pairs(ev, k=_CTX_K)


# --------------------------------- incremental agg maintenance (dx53)

_CUTOFF = "1996-01-01"

_INCR_SQL = """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS cnt,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS total,
           round(CAST(sum(cents) AS BIGINT) / 100.0 / count(*), 6)
             AS avg_value,
           round(min(cents) / 100.0, 2) AS min_value,
           round(max(cents) / 100.0, 2) AS max_value
    FROM c GROUP BY o_orderpriority
"""


@query("dx53_incremental_agg", sql=_INCR_SQL)
def dx53_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance check: the Spark side aggregates
    a historical slice and a delta slice into separate mergeable
    states (count/sum/min/max over exact integer cents) and MERGES
    them; the oracle recomputes over the whole table in one pass. A
    hash match IS the maintenance invariant — merge-maintained ==
    from-scratch, bit for bit."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(_CUTOFF).cast("timestamp")
    keys = ["o_orderpriority"]
    base = partial_state(orders.where(F.col("o_orderdate") < cut),
                         keys, "o_totalprice")
    delta = partial_state(orders.where(F.col("o_orderdate") >= cut),
                          keys, "o_totalprice")
    return finalize(merge_states(keys, base, delta), keys)


# ------------------------------------------ compaction roundtrip (qx47)

_COMPACT_SMALL_FILES = 64
_COMPACT_TARGET = 1 << 20  # 1 MiB output files

_COMPACT_SQL = """
    SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
    FROM documents
"""


@query("qx47_compact_roundtrip", sql=_COMPACT_SQL)
def qx47_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction, proven lossless: scatter documents
    across 64 tiny parquet files, compact to ~1 MiB files
    (distributed listing via binaryFile metadata, one
    read→repartition→write), read back and digest every row; the
    oracle digests the ORIGINAL table. Like qx46, the sink work runs
    eagerly at construction time against one per-session scratch tree
    reused across invocations."""
    docs = load_table(spark, sf_dir, "documents")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"compact_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    small = os.path.join(scratch, "small")
    out = os.path.join(scratch, "compacted")
    if not os.path.isdir(small):
        docs.repartition(_COMPACT_SMALL_FILES).write.mode(
            "overwrite").parquet(small)
    if not os.path.isdir(out):
        compact(spark, small, out, target_bytes=_COMPACT_TARGET)
    back = spark.read.parquet(out)
    return back.select(
        "doc_id", "lang", "source", "n_chars",
        F.md5(F.col("text").cast("binary")).alias("text_md5"))


# -------------------------------------- approximate quantiles (qx48)
#
# The scale path for percentiles at 100 TB is a mergeable sketch
# (Spark's percentile_approx — Greenwald-Khanna variant, rank error
# <= N/accuracy); the exact percentile needs per-group value
# buffering and exists here only to VERIFY the sketch. The face emits,
# per requested quantile: the exact value (rounded — both engines
# interpolate linearly) and a guarantee boolean computed by ranking
# the sketch's answer against the real distribution, the qx28
# technique (the oracle states the guarantee must hold; Spark proves
# it numerically).

_QX48_QS = [0.25, 0.5, 0.75, 0.95]
_QX48_ACC = 1000  # rank error <= n/1000

_QX48_SQL = " UNION ALL ".join(
    f"SELECT CAST({q} AS DOUBLE) AS q,"
    f" round(quantile_cont(l_extendedprice, {q}), 6) AS exact_q,"
    f" TRUE AS bound_ok FROM lineitem"
    for q in _QX48_QS
)


@query("qx48_approx_quantiles", sql=_QX48_SQL)
def qx48_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx with its rank-error contract checked in-plan,
    and the exact values it is checked against computed by DISTRIBUTED
    selection (operators/order_stats.exact_quantiles: range shuffle +
    partition-local ranking) — never Spark's single-group exact
    ``percentile``, whose one-task value buffer is the serial
    bottleneck at test scale and an OOM at 100 TB. One scan builds
    the sketch; the selection pays one count pass and one bracketing
    gather; the returned plan is a single conditional-sum scan that
    ranks the sketch's four answers (no per-row amplification)."""
    # one parquet decode for the three passes (sketch, selection,
    # rank check): the testdata files carry a single row group, so
    # every scan re-pays a serial decode — pin the projected column
    # once (rotation-managed cache, r16) and let all passes read it
    from eth_options_data_pipeline_spark.operators import scratch
    li = scratch.scoped_cache(
        load_table(spark, sf_dir, "lineitem").select("l_extendedprice"),
        "qx48")
    qs = F.lit(_QX48_QS)
    approx_row = li.agg(
        F.percentile_approx("l_extendedprice", qs, F.lit(_QX48_ACC))
         .alias("approx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    approx_vs, n = list(approx_row["approx"]), int(approx_row["n"])
    # the sketch panel above doubles as the selection's first split
    # panel — one fewer full-column sketch action; answers are exact
    # under any panel (r16)
    exact = exact_quantiles(li, "l_extendedprice", _QX48_QS,
                            splits_hint=approx_vs)

    # two-sided GK contract: the sketch's answer occupies the rank
    # interval (rank_lt, rank_le]; the bound holds iff that interval
    # intersects [q*n - eps, q*n + eps], eps = n/accuracy (+1 for
    # ties). A one-sided rank_le check would spuriously fail on a
    # wide tie bucket at the answer. Both ranks for all four answers
    # come from ONE map-side-combinable scan (8 conditional sums).
    ranks = li.agg(*(
        F.sum(F.when(F.col("l_extendedprice") <= F.lit(av), 1)
              .otherwise(0)).alias(f"le{i}")
        for i, av in enumerate(approx_vs)
    ), *(
        F.sum(F.when(F.col("l_extendedprice") < F.lit(av), 1)
              .otherwise(0)).alias(f"lt{i}")
        for i, av in enumerate(approx_vs)
    ))
    eps = n / _QX48_ACC + 1
    panel = [
        F.struct(
            F.lit(q).alias("q"),
            F.round(F.lit(ev), 6).alias("exact_q"),
            ((F.col(f"le{i}") >= q * n - eps)
             & (F.col(f"lt{i}") <= q * n + eps)).alias("bound_ok"))
        for i, (q, ev) in enumerate(exact)
    ]
    return (ranks.select(F.explode(F.array(*panel)).alias("r"))
            .select("r.q", "r.exact_q", "r.bound_ok"))


# ----------------------------------------- schema evolution (qx49)
#
# A 100 TB lake's schema changes under the pipeline: new columns
# appear in new file generations while old files stay untouched.
# The engine must read both generations in one scan with the union
# schema (old files null-fill the new column) — Spark's mergeSchema
# path. The oracle simulates the two generations relationally.

_QX49_SQL = """
    WITH u AS (
      SELECT doc_id, lang, NULL AS source FROM documents
      UNION ALL
      SELECT doc_id, lang, source FROM documents
    )
    SELECT lang, coalesce(source, '<pre-evolution>') AS src,
           count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM u GROUP BY 1, 2
"""


@query("qx49_schema_evolution", sql=_QX49_SQL)
def qx49_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: generation 1 lacks the ``source``
    column, generation 2 has it; a mergeSchema scan reads both with
    the union schema and null-fills the old files. Aggregates over
    the merged scan must equal the relational union — which is what
    the oracle states. Scratch written once per session (qx46/qx47
    pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"evolve_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    g1 = os.path.join(scratch, "g1")
    g2 = os.path.join(scratch, "g2")
    if not os.path.isdir(g1):
        docs.select("doc_id", "lang").write.mode("overwrite").parquet(g1)
    if not os.path.isdir(g2):
        docs.select("doc_id", "lang", "source").write.mode(
            "overwrite").parquet(g2)
    merged = spark.read.option("mergeSchema", "true").parquet(g1, g2)
    return merged.groupBy(
        "lang", F.coalesce("source", F.lit("<pre-evolution>")).alias("src"),
    ).agg(F.count(F.lit(1)).alias("cnt"),
          F.sum("doc_id").alias("id_sum"))
